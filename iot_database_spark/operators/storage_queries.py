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


@register(
    "evolution_nullfill_digest",
    oracle=f"""
    WITH src AS (
        SELECT CAST(event_id AS BIGINT) AS id,
               CAST(user_id AS BIGINT) AS user_id,
               CAST(value AS DOUBLE) AS value
        FROM events WHERE CAST(event_id AS BIGINT) < {2 * _N}
    )
    SELECT COUNT(*) AS n_rows,
           COUNT(*) FILTER (WHERE id < {_N}) AS n_null_score,
           CAST(SUM(CAST(FLOOR(value * 1000000) AS BIGINT))
                FILTER (WHERE id >= {_N}) AS BIGINT) AS sum_score_micros
    FROM src
    """,
)
def evolution_nullfill_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution under the hash gate: rows inserted BEFORE
    add_column must read the new column as NULL (missing-BSON-field
    semantics), rows after carry their values — digested as null count
    + integer sum and checked against an oracle that derives the same
    split from the source data."""
    from iot_database_spark.database import IotDatabase

    tables = load_views(spark, sf_dir)
    src = tables["events"].select(
        F.col("event_id").cast("bigint").alias("id"),
        F.col("user_id").cast("bigint").alias("user_id"),
        F.col("value").cast("double").alias("value"),
    )

    root = tempfile.mkdtemp(prefix="evolution_q_")
    db = IotDatabase("evq", root, spark)
    t = db.tables("ev", "id bigint, user_id bigint")
    t.insert(src.filter(F.col("id") < _N).select("id", "user_id"))
    t.add_column("score", "double")
    t.insert(
        src.filter((F.col("id") >= _N) & (F.col("id") < 2 * _N)).select(
            "id", "user_id", F.col("value").alias("score")
        )
    )
    return t.df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_if(F.col("score").isNull()).alias("n_null_score"),
        F.sum(F.floor(F.col("score") * 1000000).cast("bigint")).alias(
            "sum_score_micros"
        ),
    )


@register(
    "txn_atomicity_digest",
    oracle=f"""
    WITH src AS (
        SELECT CAST(event_id AS BIGINT) AS id,
               CAST(user_id AS BIGINT) AS user_id
        FROM events WHERE CAST(event_id AS BIGINT) < {_N}
    )
    SELECT 'committed' AS outcome, COUNT(*) AS n_a, COUNT(*) AS n_b,
           CAST(SUM(user_id) AS BIGINT) AS sum_user
    FROM src WHERE id % 2 = 0
    """,
)
def txn_atomicity_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BEGIN/COMMIT/ROLLBACK under the hash gate: a committed
    transaction's writes to TWO tables are both visible; a rolled-back
    transaction's writes to the same tables are both invisible. The
    digest reflects only the committed half — the oracle derives it
    from the source data, so any rollback leakage breaks the hash."""
    from iot_database_spark.database import IotDatabase

    tables = load_views(spark, sf_dir)
    src = tables["events"].select(
        F.col("event_id").cast("bigint").alias("id"),
        F.col("user_id").cast("bigint").alias("user_id"),
    ).filter(F.col("id") < _N)

    root = tempfile.mkdtemp(prefix="txn_q_")
    db = IotDatabase("txq", root, spark)
    ta = db.tables("a", "id bigint, user_id bigint")
    tb = db.tables("b", "id bigint, user_id bigint")
    committed = src.filter(F.col("id") % 2 == 0)
    aborted = src.filter(F.col("id") % 2 == 1)
    with db.transaction():
        ta.insert(committed)
        tb.insert(committed)
    try:
        with db.transaction():
            ta.insert(aborted.select((F.col("id") + 10 * _N).alias("id"), "user_id"))
            tb.insert(aborted.select((F.col("id") + 10 * _N).alias("id"), "user_id"))
            raise RuntimeError("abort on purpose")
    except RuntimeError:
        pass
    return (
        ta.df.agg(
            F.count(F.lit(1)).alias("n_a"),
            F.sum("user_id").alias("sum_user"),
        )
        .crossJoin(tb.df.agg(F.count(F.lit(1)).alias("n_b")))
        .select(
            F.lit("committed").alias("outcome"), "n_a", "n_b", "sum_user"
        )
    )


@register(
    "fk_cascade_digest",
    oracle=f"""
    WITH parents AS (
        SELECT DISTINCT CAST(user_id AS BIGINT) AS id
        FROM events WHERE CAST(event_id AS BIGINT) < {_N}
    ),
    child AS (
        SELECT CAST(event_id AS BIGINT) AS id,
               CAST(user_id AS BIGINT) AS user_id
        FROM events WHERE CAST(event_id AS BIGINT) < {_N}
    )
    SELECT COUNT(*) AS n_children,
           CAST(SUM(id) AS BIGINT) AS sum_child_id,
           (SELECT COUNT(*) FROM parents WHERE id % 7 <> 0) AS n_parents
    FROM child WHERE user_id % 7 <> 0
    """,
)
def fk_cascade_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cascading FK delete under the hash gate: deleting every parent
    with id % 7 = 0 must remove exactly their children and nothing
    else; the oracle derives the surviving set from the source data,
    so over- or under-cascading breaks the hash."""
    from iot_database_spark.database import IotDatabase
    from iot_database_spark.tables import ForeignKey

    tables = load_views(spark, sf_dir)
    src = tables["events"].select(
        F.col("event_id").cast("bigint").alias("id"),
        F.col("user_id").cast("bigint").alias("user_id"),
    ).filter(F.col("id") < _N)

    root = tempfile.mkdtemp(prefix="fk_q_")
    db = IotDatabase("fkq", root, spark)
    parents = db.tables("parents", "id bigint")
    children = db.tables(
        "children",
        "id bigint, parents_id bigint",
        foreign_keys=[
            ForeignKey(column="parents_id", parent="parents", constraint="cascading")
        ],
    )
    parents.insert(src.select("user_id").distinct().select(F.col("user_id").alias("id")))
    children.insert(src.select("id", F.col("user_id").alias("parents_id")))
    parents.delete("id % 7 = 0")
    return children.df.agg(
        F.count(F.lit(1)).alias("n_children"),
        F.sum("id").alias("sum_child_id"),
    ).crossJoin(
        parents.df.agg(F.count(F.lit(1)).alias("n_parents"))
    ).select("n_children", "sum_child_id", "n_parents")
