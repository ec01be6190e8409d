"""Continuous aggregates + retention — the materialized-rollup layer a
TSDB runs on top of raw samples.

The reference's continuous-query service re-executes full queries on a
timer (QueryExecutionService.cs) — O(history) every tick. At 100 TB the
only viable shape is INCREMENTAL refresh: recompute just the buckets
that received new data and merge them into the materialized rollup
(TimescaleDB-style continuous aggregates, rebuilt here as plain
DataFrame ops + an idempotent partition overwrite).

Retention closes the loop: raw samples older than the retention horizon
are dropped once their rollup buckets are materialized — the standard
downsample-then-expire lifecycle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from iot_database_spark.operators.timeseries import rollup_by_interval


def refresh_rollup(
    existing_rollup: DataFrame | None,
    samples: DataFrame,
    since: Column | str,
    interval: str = "1 hour",
    guid: str = "guid",
    ts: str = "ts",
    value: str = "value",
) -> DataFrame:
    """Incremental refresh: recompute only buckets with bucket_start >=
    `since` from the raw samples, keep older buckets from the existing
    rollup untouched.

    Correctness contract (tested): refresh(existing, samples, since)
    == full rollup over all samples, provided `existing` was built from
    the same samples before `since`. At storage level the recomputed
    buckets map to a partition-overwrite of the rollup table's recent
    date partitions only.
    """
    since_c = F.lit(since).cast("timestamp") if isinstance(since, str) else since
    fresh = rollup_by_interval(
        samples.filter(F.col(ts) >= since_c), interval, guid=guid, ts=ts, value=value
    )
    if existing_rollup is None:
        return fresh
    kept = existing_rollup.filter(F.col("bucket_start") < since_c)
    return kept.unionByName(fresh)


def apply_retention(
    samples: DataFrame,
    rollup: DataFrame,
    horizon: Column | str,
    ts: str = "ts",
) -> tuple[DataFrame, DataFrame]:
    """Downsample-then-expire: returns (kept_raw, expired_raw).

    Raw samples older than `horizon` are only expired if their hour
    bucket exists in the rollup (never drop data that hasn't been
    downsampled — the safety rule of every retention policy).
    """
    horizon_c = (
        F.lit(horizon).cast("timestamp") if isinstance(horizon, str) else horizon
    )
    bucketed = samples.withColumn("_bucket", F.date_trunc("hour", F.col(ts)))
    covered = rollup.select(
        F.col("bucket_start").alias("_bucket")
    ).distinct().withColumn("_covered", F.lit(1))
    marked = bucketed.join(F.broadcast(covered), "_bucket", "left")
    is_expired = (F.col(ts) < horizon_c) & F.col("_covered").isNotNull()
    expired = marked.filter(is_expired).drop("_bucket", "_covered")
    kept = marked.filter(~is_expired).drop("_bucket", "_covered")
    return kept, expired
