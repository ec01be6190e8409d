from iot_database_spark.streaming.continuous import (
    ContinuousQueryService,
    QueryConfiguration,
)

__all__ = ["ContinuousQueryService", "QueryConfiguration"]
