"""File sources/sinks + custom-source registration — the reference's
system collections surface.

Reference:
- $file_csv input/output — LiteDB/Engine/SystemCollections/SysFileCsv.cs
  (:19-78 read, :80-170 write)
- $file_json input/output — SysFileJson.cs
- SELECT ... INTO <collection> — QueryExecutor.ExecuteQueryInto
  (QueryExecutor.cs:149-180)
- RegisterSystemCollection(name, factory) —
  LiteDB/Engine/Engine/SystemCollections.cs:28-45

Spark-first: these map to spark.read/write (distributed, splittable,
schema-inferred or declared) and temp-view registration. Binary/blob
files go through the binaryFile source + the FileManager metadata tables
(iot_database_spark/files.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def read_csv(
    spark: SparkSession, path: str, schema: str | None = None, header: bool = True
) -> DataFrame:
    """$file_csv('path') source (SysFileCsv.Input :19-78)."""
    reader = spark.read.option("header", str(header).lower())
    if schema:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def write_csv(df: DataFrame, path: str, header: bool = True, mode: str = "overwrite") -> None:
    """SELECT ... INTO $file_csv(...) sink (SysFileCsv.Output :80-170)."""
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def read_json(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """$file_json source (SysFileJson.Input)."""
    reader = spark.read
    if schema:
        reader = reader.schema(schema)
    return reader.json(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """$file_json sink (SysFileJson.Output)."""
    df.write.mode(mode).json(path)


def select_into(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """SELECT ... INTO <collection> (QueryExecutor.cs:149-180): persist a
    query result as a parquet table (CTAS)."""
    df.write.mode(mode).parquet(path)


def register_source(
    spark: SparkSession, name: str, factory: Callable[[], DataFrame]
) -> DataFrame:
    """RegisterSystemCollection equivalent: expose any DataFrame factory
    as a queryable named view `$name` (SystemCollections.cs:28-45)."""
    df = factory()
    df.createOrReplaceTempView(name)
    return df
