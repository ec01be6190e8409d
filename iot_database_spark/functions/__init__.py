from iot_database_spark.functions.dialect import FUNCTIONS, call

__all__ = ["FUNCTIONS", "call"]
