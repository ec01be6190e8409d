"""Driver-graded storage-layer queries: the versioned commit log's
user-visible semantics (time travel) under the DuckDB hash gate.

The reference's storage layer exposes page-level snapshots via its WAL
(LiteDB/Engine/Services/WalIndexService.cs) and per-file version chains
(FileManager/FileVersionNode.cs); this engine's analog is manifest
versioning with `as_of` reads (tables.py). The query below exercises
the full lifecycle — create, insert, delete, read BOTH versions — and
must hash-match an oracle that derives each version's digest from the
source data directly, proving the old snapshot is byte-stable after
the delete rewrote the table.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iot_database_spark.registry import load_views, register

_N = 2000  # rows ingested (event_id < _N) — constant across scale factors


@register(
    "timetravel_asof_digest",
    oracle=f"""
    WITH src AS (
        SELECT CAST(event_id AS BIGINT) AS id,
               CAST(user_id AS BIGINT) AS user_id,
               CAST(value AS DOUBLE) AS value
        FROM events WHERE CAST(event_id AS BIGINT) < {_N}
    )
    SELECT 0 AS version, COUNT(*) AS n_rows,
           CAST(SUM(user_id) AS BIGINT) AS sum_user,
           CAST(SUM(CAST(FLOOR(value * 1000000) AS BIGINT)) AS BIGINT)
               AS sum_value_micros
    FROM src
    UNION ALL
    SELECT 1, COUNT(*),
           CAST(SUM(user_id) AS BIGINT),
           CAST(SUM(CAST(FLOOR(value * 1000000) AS BIGINT)) AS BIGINT)
    FROM src WHERE user_id % 10 <> 0
    """,
)
def timetravel_asof_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Version-0 and head digests of a table that was inserted then
    delete-rewritten: `as_of(0)` must still see every pre-delete row
    (snapshot stability across rewrites), head must see the survivors.
    Digests are count + integer sums (floor-scaled for the double), so
    the hash compare is partition-order-free on both engines."""
    from iot_database_spark.database import IotDatabase

    tables = load_views(spark, sf_dir)
    src = tables["events"].select(
        F.col("event_id").cast("bigint").alias("id"),
        F.col("user_id").cast("bigint").alias("user_id"),
        F.col("value").cast("double").alias("value"),
    ).filter(F.col("id") < _N)

    root = tempfile.mkdtemp(prefix="timetravel_q_")
    db = IotDatabase("ttq", root, spark)
    t = db.tables("ev", "id bigint, user_id bigint, value double")
    t.insert(src)  # version 0
    t.delete("user_id % 10 = 0")  # version 1 (full-snapshot rewrite)

    def digest(df: DataFrame, version: int) -> DataFrame:
        return df.agg(
            F.lit(version).alias("version"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("user_id").alias("sum_user"),
            F.sum(F.floor(F.col("value") * 1000000).cast("bigint")).alias(
                "sum_value_micros"
            ),
        )

    return digest(t.as_of(0), 0).unionByName(digest(t.df, 1))
