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


@register(
    "continuous_slot14_digest",
    oracle=f"""
    WITH writes AS (
        SELECT CAST(user_id AS BIGINT) % 4 AS dev,
               CAST(event_id AS BIGINT) % 1000 AS v
        FROM events WHERE CAST(event_id AS BIGINT) < {_N}
    )
    SELECT concat('res-', CAST(dev AS VARCHAR)) AS guid,
           14 AS priority,
           CAST(CAST(FLOOR(1000000.0 * SUM(v) / COUNT(*)) AS BIGINT)
                AS VARCHAR) AS value,
           2 AS n_scheduled_runs
    FROM writes GROUP BY dev
    """,
)
def continuous_slot14_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ContinuousQueryService -> slot-14 materialization path under
    the hash gate (r8 verdict #7 — previously pytest-only): ingest a
    bounded event slice through the PointStore, register four named
    queries (two scheduled, ticked with a pinned clock; two lazy,
    executing on read — QueryExecutionService.cs:60-110 /
    IotValue.cs:1193-1252), land every result as a priority-14 point
    write via as_point_writes, and replay the slot state. The oracle
    derives each result point's value straight from the source events,
    so a scheduler that skips a due query, a gating bug on priority 14,
    or a slot-replay fault all break the hash. Per-point means are
    floor-scaled micro ints (one double multiply+divide of exact ints —
    engine-identical), stored as the strings IotValue slots hold."""
    from iot_database_spark.database import IotDatabase
    from iot_database_spark.points import PointStore
    from iot_database_spark.streaming.continuous import (
        ContinuousQueryService,
        QueryConfiguration,
        as_point_writes,
    )

    tables = load_views(spark, sf_dir)
    src = tables["events"].select(
        F.col("event_id").cast("bigint").alias("eid"),
        F.col("user_id").cast("bigint").alias("uid"),
        "ts",
    ).filter(F.col("eid") < _N)

    root = tempfile.mkdtemp(prefix="cq_slot14_")
    db = IotDatabase("cqdb", root, spark)
    store = PointStore(db)
    n_dev = 4
    store.register_points(
        [{"guid": f"dev-{i}"} for i in range(n_dev)]
        + [{"guid": f"res-{i}"} for i in range(n_dev)]
    )
    store.write_batch(
        src.select(
            F.concat(F.lit("dev-"), (F.col("uid") % n_dev).cast("string")).alias(
                "guid"
            ),
            "ts",
            F.lit(15).alias("priority"),
            (F.col("eid") % 1000).cast("string").alias("value"),
        )
    )

    svc = ContinuousQueryService(spark)
    for i in range(n_dev):

        def q(s: SparkSession, i: int = i) -> DataFrame:
            w = store.writes.df.filter(F.col("guid") == f"dev-{i}")
            return w.agg(
                F.floor(
                    F.lit(1000000.0)
                    * F.sum(F.col("value").cast("bigint"))
                    / F.count(F.lit(1))
                )
                .cast("bigint")
                .alias("mean_micro")
            )

        svc.add_query(
            QueryConfiguration(
                f"mean_dev_{i}", q, interval_ms=1000 if i % 2 == 0 else 0
            )
        )
    ran = svc.tick(now=2.0)  # pinned clock: exactly the two scheduled run
    # read_many overlaps the two LAZY executions (guide §2.6) — results
    # and the union order below are identical to a sequential read loop
    results = svc.read_many([f"mean_dev_{i}" for i in range(n_dev)])
    result_writes = None
    for i in range(n_dev):
        r = results[f"mean_dev_{i}"]
        w = as_point_writes(
            r.withColumn("_ts", F.to_timestamp(F.lit("2024-06-01 00:00:00"))),
            guid=f"res-{i}",
            ts_col="_ts",
        )
        result_writes = w if result_writes is None else result_writes.unionByName(w)
    store.write_batch(result_writes)

    state = store.current_state().filter(F.col("guid").startswith("res-"))
    return state.select(
        "guid",
        F.col("priority").cast("int").alias("priority"),
        "value",
        F.lit(len(ran)).cast("int").alias("n_scheduled_runs"),
    )
