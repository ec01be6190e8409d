"""Continuous-aggregate refresh + retention tests: incremental refresh
must equal the full recompute; retention must never expire raw data whose
bucket isn't materialized."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from iot_database_spark.operators.caggs import apply_retention, refresh_rollup
from iot_database_spark.operators.timeseries import rollup_by_interval


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _samples(spark, rows):
    return spark.createDataFrame(rows, "guid string, ts timestamp, value double")


def _sorted_rows(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=repr,
    )


def test_incremental_refresh_equals_full_recompute(spark):
    day1 = [
        ("g", _ts("2024-01-01T00:10:00"), 10.0),
        ("g", _ts("2024-01-01T05:00:00"), 20.0),
        ("h", _ts("2024-01-01T06:30:00"), 5.0),
    ]
    day2 = [
        ("g", _ts("2024-01-02T01:00:00"), 30.0),
        ("h", _ts("2024-01-02T02:00:00"), 7.0),
    ]
    all_samples = _samples(spark, day1 + day2)

    # initial materialization from day1 only
    initial = rollup_by_interval(_samples(spark, day1), "1 hour")
    # incremental refresh for everything since day2
    refreshed = refresh_rollup(
        initial, all_samples, since="2024-01-02 00:00:00", interval="1 hour"
    )
    full = rollup_by_interval(all_samples, "1 hour")
    assert _sorted_rows(refreshed) == _sorted_rows(full)


def test_refresh_recomputes_modified_recent_buckets(spark):
    # late data lands in an already-materialized recent bucket: refreshing
    # with since <= that bucket folds it in
    first = [("g", _ts("2024-01-01T10:05:00"), 1.0)]
    late = [("g", _ts("2024-01-01T10:55:00"), 9.0)]
    initial = rollup_by_interval(_samples(spark, first), "1 hour")
    refreshed = refresh_rollup(
        initial,
        _samples(spark, first + late),
        since="2024-01-01 10:00:00",
    )
    row = refreshed.collect()[0]
    assert row["n_samples"] == 2 and row["last_value"] == 9.0


def test_retention_only_expires_covered_buckets(spark):
    samples = _samples(
        spark,
        [
            ("g", _ts("2024-01-01T00:10:00"), 1.0),  # old, covered
            ("g", _ts("2024-01-01T01:10:00"), 2.0),  # old, NOT covered
            ("g", _ts("2024-01-05T00:10:00"), 3.0),  # recent
        ],
    )
    rollup = rollup_by_interval(
        samples.filter(F.col("ts") < "2024-01-01 01:00:00"), "1 hour"
    )
    kept, expired = apply_retention(samples, rollup, horizon="2024-01-03 00:00:00")
    assert [r["value"] for r in expired.collect()] == [1.0]
    assert sorted(r["value"] for r in kept.collect()) == [2.0, 3.0]
