from iot_database_spark.query.nl import FindSpec, execute_find, parse_find

__all__ = ["FindSpec", "execute_find", "parse_find"]
