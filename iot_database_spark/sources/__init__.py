from iot_database_spark.sources.files import (
    read_csv,
    read_json,
    register_source,
    select_into,
    write_csv,
    write_json,
)

__all__ = [
    "read_csv",
    "read_json",
    "register_source",
    "select_into",
    "write_csv",
    "write_json",
]
