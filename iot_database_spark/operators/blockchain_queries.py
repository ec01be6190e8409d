"""Oracle-checked queries for the hash-chained audit log (SURVEY.md §2.11
— reference Iot.Database/Blockchain/).

events models the block source: one chain per user_id, data = props JSON,
consecutive duplicate data dropped. The Spark side builds chains via
applyInPandas (parallel across chains, sequential within — the hash
recurrence is irreducible); the oracle rebuilds them with a recursive CTE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iot_database_spark.functions.time import epoch_us
from iot_database_spark.operators import blockchain as bc
from iot_database_spark.registry import load_views, register

_ORACLE_CHAIN_CTE = """
    WITH RECURSIVE src AS (
        SELECT CAST(user_id AS BIGINT) AS guid,
               date_trunc('microsecond', ts) AS ts,
               props AS data,
               LAG(props) OVER (PARTITION BY CAST(user_id AS BIGINT)
                                ORDER BY date_trunc('microsecond', ts), props)
                   AS prev_data
        FROM events
    ), dedup AS (
        SELECT guid, ts, data,
               ROW_NUMBER() OVER (PARTITION BY guid ORDER BY ts, data) AS pos
        FROM src
        WHERE prev_data IS NULL OR data <> prev_data
    ), chain AS (
        SELECT guid, pos, ts, data,
               '' AS prev_hash,
               sha256(concat(CAST(epoch_us(ts) AS VARCHAR), '', data)) AS hash
        FROM dedup WHERE pos = 1
        UNION ALL
        SELECT d.guid, d.pos, d.ts, d.data,
               c.hash AS prev_hash,
               sha256(concat(CAST(epoch_us(d.ts) AS VARCHAR), c.hash, d.data))
        FROM dedup d
        JOIN chain c ON d.guid = c.guid AND d.pos = c.pos + 1
    )
"""


def _chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    tables = load_views(spark, sf_dir)
    blocks = tables["events"].select(
        F.col("user_id").cast("bigint").alias("guid"),
        F.col("ts"),
        F.col("props").alias("data"),
    )
    return bc.append_chain(bc.dedup_consecutive(blocks))


@register(
    "chain_append",
    oracle=_ORACLE_CHAIN_CTE
    + """
    SELECT guid, CAST(epoch_us(ts) AS BIGINT) AS ts_us, prev_hash, hash
    FROM chain
    """,
)
def chain_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key hash chains: sha256(epoch_us || prev_hash || data), dedup of
    consecutive identical data (Block.CalculateHash Blockchain/Block.cs:24-39;
    BlockCollection.Insert :52-68)."""
    return _chain(spark, sf_dir).select(
        "guid",
        epoch_us("ts").alias("ts_us"),
        "prev_hash",
        "hash",
    )


@register(
    "chain_verify",
    oracle=_ORACLE_CHAIN_CTE
    + """
    SELECT guid,
           COUNT(*) AS n_blocks,
           CAST(NULL AS BIGINT) AS first_break,
           TRUE AS valid,
           MAX(CASE WHEN pos = mx THEN hash END) AS head_hash
    FROM (SELECT *, MAX(pos) OVER (PARTITION BY guid) AS mx FROM chain) t
    GROUP BY guid
    """,
)
def chain_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build chains then verify them JVM-side (window lag + sha2 recompute
    — VerifyBlockList BlockCollection.cs:131-155). On untampered input
    every chain validates; head_hash pins the full chain content."""
    verified = bc.verify_chain(_chain(spark, sf_dir))
    return verified.select(
        "guid",
        "n_blocks",
        F.col("first_break").cast("bigint").alias("first_break"),
        "valid",
        "head_hash",
    )
