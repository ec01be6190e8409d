"""Oracle-checked queries for the time-series read path (SURVEY.md §1.5 —
reference Iot.Database/TimeSeries/TsCollection.cs).

events models the series log: guid = user_id, ts, value. 'error' events
write priority-1 values, 'signup' priority-9, everything else priority-15
— exercising the LOCF merge across priority slots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iot_database_spark.functions.time import epoch_us
from iot_database_spark.operators import timeseries as ts_ops
from iot_database_spark.registry import load_views, register

_PRIORITY = (
    "CASE WHEN event_type = 'error' THEN 1 "
    "WHEN event_type = 'signup' THEN 9 ELSE 15 END"
)


def _series(spark: SparkSession, sf_dir: str) -> DataFrame:
    tables = load_views(spark, sf_dir)
    return tables["events"].select(
        F.col("user_id").cast("bigint").alias("guid"),
        F.col("ts"),
        F.expr(_PRIORITY).cast("int").alias("priority"),
        F.col("value").cast("double").alias("value"),
        F.col("event_id").cast("bigint").alias("event_id"),
    )


@register(
    "ts_locf_merge",
    oracle=f"""
    WITH series AS (
        SELECT CAST(user_id AS BIGINT) AS guid,
               date_trunc('microsecond', ts) AS ts,
               CAST({_PRIORITY} AS INT) AS priority,
               CAST(value AS DOUBLE) AS value,
               CAST(event_id AS BIGINT) AS event_id
        FROM events
    )
    SELECT guid,
           CAST(epoch_us(ts) AS BIGINT) AS ts_us,
           LAST_VALUE(CASE WHEN priority = 1 THEN value END IGNORE NULLS)
               OVER w AS slot_1,
           LAST_VALUE(CASE WHEN priority = 9 THEN value END IGNORE NULLS)
               OVER w AS slot_9,
           LAST_VALUE(CASE WHEN priority = 15 THEN value END IGNORE NULLS)
               OVER w AS slot_15,
           COALESCE(
               LAST_VALUE(CASE WHEN priority = 1 THEN value END IGNORE NULLS) OVER w,
               LAST_VALUE(CASE WHEN priority = 9 THEN value END IGNORE NULLS) OVER w,
               LAST_VALUE(CASE WHEN priority = 15 THEN value END IGNORE NULLS) OVER w
           ) AS eff_value
    FROM series
    WINDOW w AS (PARTITION BY guid ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def ts_locf_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority-merged LOCF event stream (TsCollection.cs:163-181): each
    event carries every slot's last-observed value; effective value =
    lowest-numbered non-null slot."""
    merged = ts_ops.locf_merge(
        _series(spark, sf_dir), priorities=(1, 9, 15), tiebreak="event_id"
    )
    return merged.select(
        "guid",
        epoch_us("ts").alias("ts_us"),
        "slot_1",
        "slot_9",
        "slot_15",
        F.col("eff_value"),
    )


@register(
    "ts_resample_interp",
    oracle="""
    WITH samples AS (
        SELECT CAST(user_id AS BIGINT) AS guid,
               date_trunc('microsecond', ts) AS grid_ts,
               CAST(value AS DOUBLE) AS v,
               1 AS is_sample
        FROM events
    ), guids AS (
        SELECT DISTINCT guid FROM samples
    ), grid AS (
        SELECT guid, gs AS grid_ts, CAST(NULL AS DOUBLE) AS v, 0 AS is_sample
        FROM guids,
             generate_series(TIMESTAMP '2024-01-01 00:00:00',
                             TIMESTAMP '2024-01-08 00:00:00',
                             INTERVAL 1 HOUR) t(gs)
    ), unioned AS (
        SELECT * FROM samples UNION ALL SELECT * FROM grid
    ), resolved AS (
        SELECT guid, grid_ts, is_sample,
               LAST_VALUE(v IGNORE NULLS) OVER w_before AS prev_v,
               LAST_VALUE(CASE WHEN is_sample = 1 THEN grid_ts END IGNORE NULLS)
                   OVER w_before AS prev_ts,
               FIRST_VALUE(v IGNORE NULLS) OVER w_after AS next_v,
               FIRST_VALUE(CASE WHEN is_sample = 1 THEN grid_ts END IGNORE NULLS)
                   OVER w_after AS next_ts
        FROM unioned
        WINDOW
          w_before AS (PARTITION BY guid ORDER BY grid_ts, is_sample DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
          w_after AS (PARTITION BY guid ORDER BY grid_ts, is_sample DESC
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT guid,
           CAST(epoch_us(grid_ts) AS BIGINT) AS grid_ts_us,
           CASE
             WHEN prev_ts = grid_ts THEN prev_v
             WHEN next_ts IS NOT NULL AND next_ts <> prev_ts
                  AND prev_v IS NOT NULL AND next_v IS NOT NULL
             THEN prev_v + (next_v - prev_v)
                  * (CAST(epoch_us(grid_ts) - epoch_us(prev_ts) AS DOUBLE)
                     / CAST(epoch_us(next_ts) - epoch_us(prev_ts) AS DOUBLE))
             ELSE prev_v
           END AS value,
           (prev_ts <> grid_ts
            AND next_ts IS NOT NULL AND next_ts <> prev_ts
            AND prev_v IS NOT NULL AND next_v IS NOT NULL) AS interpolated
    FROM resolved
    WHERE is_sample = 0 AND prev_ts IS NOT NULL
    """,
)
def ts_resample_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly-grid resample with linear interpolation + interpolated flag
    (TsCollection.cs:188-233); fill-forward at the trailing edge, grid
    points before the first sample skipped."""
    series = _series(spark, sf_dir)
    out = ts_ops.resample(
        series,
        start="2024-01-01 00:00:00",
        end="2024-01-08 00:00:00",
        interval="1 HOUR",
    )
    return out.select(
        "guid",
        epoch_us("grid_ts").alias("grid_ts_us"),
        "value",
        "interpolated",
    )


# ---------------------------------------------------------------------------
# First-class TSDB operators beyond the reference's read path: as-of join,
# time-bucket rollup, gap detection, rate of change
# ---------------------------------------------------------------------------


@register(
    "ts_asof_join",
    oracle="""
    WITH purchases AS (
        SELECT CAST(user_id AS BIGINT) AS guid,
               CAST(event_id AS BIGINT) AS event_id,
               date_trunc('microsecond', ts) AS ts
        FROM events WHERE event_type = 'purchase'
    ), logins AS (
        SELECT CAST(user_id AS BIGINT) AS guid,
               date_trunc('microsecond', ts) AS ts,
               CAST(value AS DOUBLE) AS value
        FROM events WHERE event_type = 'signup'
    )
    SELECT p.event_id,
           p.guid,
           CAST(epoch_us(p.ts) AS BIGINT) AS ts_us,
           l.value AS asof_value,
           CAST(epoch_us(l.ts) AS BIGINT) AS asof_ts_us
    FROM purchases p
    ASOF LEFT JOIN logins l
      ON p.guid = l.guid AND p.ts >= l.ts
    """,
)
def ts_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's most recent prior
    signup (DuckDB checks with its native ASOF JOIN; the Spark plan is the
    union+window form that scales without a range join)."""
    tables = load_views(spark, sf_dir)
    ev = tables["events"]
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").cast("bigint").alias("guid"),
        F.col("event_id").cast("bigint").alias("event_id"),
        "ts",
    )
    logins = ev.filter(F.col("event_type") == "signup").select(
        F.col("user_id").cast("bigint").alias("guid"),
        "ts",
        F.col("value").cast("double").alias("value"),
    )
    joined = ts_ops.asof_join(purchases, logins, on="guid")
    return joined.select(
        "event_id",
        "guid",
        epoch_us("ts").alias("ts_us"),
        F.col("asof_value"),
        epoch_us("asof_ts").alias("asof_ts_us"),
    )


@register(
    "ts_rollup_hourly",
    oracle="""
    SELECT CAST(user_id AS BIGINT) AS guid,
           CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS bucket_us,
           COUNT(*) AS n_samples,
           MIN(CAST(value AS DOUBLE)) AS min_value,
           MAX(CAST(value AS DOUBLE)) AS max_value,
           arg_min(CAST(value AS DOUBLE), ts) AS first_value,
           arg_max(CAST(value AS DOUBLE), ts) AS last_value
    FROM events
    GROUP BY 1, 2
    """,
)
def ts_rollup_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style hourly rollup: count/min/max/first/last per
    (series, hour bucket) — single partial+final aggregation."""
    tables = load_views(spark, sf_dir)
    samples = tables["events"].select(
        F.col("user_id").cast("bigint").alias("guid"),
        "ts",
        F.col("value").cast("double").alias("value"),
    )
    out = ts_ops.rollup_by_interval(samples, "1 hour")
    return out.select(
        "guid",
        epoch_us("bucket_start").alias("bucket_us"),
        "n_samples",
        "min_value",
        "max_value",
        "first_value",
        "last_value",
    )


@register(
    "ts_detect_gaps",
    oracle="""
    WITH s AS (
        SELECT CAST(user_id AS BIGINT) AS guid,
               date_trunc('microsecond', ts) AS ts,
               LAG(date_trunc('microsecond', ts)) OVER (
                   PARTITION BY CAST(user_id AS BIGINT) ORDER BY ts) AS prev_ts
        FROM events
    )
    SELECT guid,
           CAST(epoch_us(prev_ts) AS BIGINT) AS gap_start_us,
           CAST(epoch_us(ts) AS BIGINT) AS gap_end_us,
           CAST(epoch_us(ts) - epoch_us(prev_ts) AS DOUBLE) / 1000000.0 AS gap_seconds
    FROM s
    WHERE prev_ts IS NOT NULL
      AND CAST(epoch_us(ts) - epoch_us(prev_ts) AS DOUBLE) / 1000000.0 > 21600.0
    """,
)
def ts_detect_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap detection: series silences longer than 6 hours."""
    tables = load_views(spark, sf_dir)
    samples = tables["events"].select(
        F.col("user_id").cast("bigint").alias("guid"), "ts"
    )
    out = ts_ops.detect_gaps(samples, max_gap_seconds=21600.0)
    return out.select(
        "guid",
        epoch_us("gap_start").alias("gap_start_us"),
        epoch_us("gap_end").alias("gap_end_us"),
        "gap_seconds",
    )


@register(
    "ts_rate_of_change",
    oracle="""
    WITH s AS (
        SELECT CAST(user_id AS BIGINT) AS guid,
               date_trunc('microsecond', ts) AS ts,
               CAST(value AS DOUBLE) AS value,
               CAST(event_id AS BIGINT) AS event_id
        FROM events
    )
    SELECT guid,
           CAST(epoch_us(ts) AS BIGINT) AS ts_us,
           value,
           value - LAG(value) OVER w AS delta,
           (value - LAG(value) OVER w)
             / (CAST(epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS DOUBLE) / 1000000.0)
             AS rate_per_sec
    FROM s
    WINDOW w AS (PARTITION BY guid ORDER BY ts)
    QUALIFY LAG(value) OVER w IS NOT NULL
    """,
)
def ts_rate_of_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Counter derivative: per-sample delta and per-second rate."""
    tables = load_views(spark, sf_dir)
    samples = tables["events"].select(
        F.col("user_id").cast("bigint").alias("guid"),
        "ts",
        F.col("value").cast("double").alias("value"),
    )
    out = ts_ops.rate_of_change(samples)
    return out.select(
        "guid",
        epoch_us("ts").alias("ts_us"),
        "value",
        "delta",
        "rate_per_sec",
    )


@register(
    "cagg_incremental_refresh",
    oracle="""
    SELECT CAST(user_id AS BIGINT) AS guid,
           CAST(epoch_us(date_trunc('hour', date_trunc('microsecond', ts)))
                AS BIGINT) AS bucket_us,
           COUNT(*) AS n_samples,
           MIN(CAST(value AS DOUBLE)) AS min_value,
           MAX(CAST(value AS DOUBLE)) AS max_value
    FROM events
    GROUP BY 1, 2
    """,
)
def cagg_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate INCREMENTAL refresh under the hash gate: a
    base rollup materialized from the first half of the month, then
    refresh_rollup recomputes only buckets >= the split from the full
    sample stream and keeps older buckets untouched — the merged result
    must equal a full GROUP BY over everything (the TimescaleDB-style
    incremental == full contract, here cross-engine hash-checked; the
    reference's QueryExecutionService re-runs full queries every tick,
    O(history), which this path replaces at scale). first/last columns
    are dropped from the graded output (arg_min ties on duplicate
    timestamps are engine-nondeterministic)."""
    from iot_database_spark.operators.caggs import refresh_rollup

    tables = load_views(spark, sf_dir)
    samples = tables["events"].select(
        F.col("user_id").cast("bigint").alias("guid"),
        "ts",
        F.col("value").cast("double").alias("value"),
    )
    split = "2024-01-16 00:00:00"
    base = ts_ops.rollup_by_interval(
        samples.filter(F.col("ts") < F.lit(split).cast("timestamp")), "1 hour"
    )
    merged = refresh_rollup(base, samples, since=split, interval="1 hour")
    return merged.select(
        "guid",
        epoch_us("bucket_start").alias("bucket_us"),
        "n_samples",
        "min_value",
        "max_value",
    )


@register(
    "ts_range_join",
    oracle="""
    WITH incidents AS (
        SELECT CAST(event_id AS BIGINT) AS incident_id,
               date_trunc('microsecond', ts) AS start_ts,
               date_trunc('microsecond', ts) + INTERVAL 30 MINUTE AS end_ts
        FROM events WHERE event_type = 'error'
    ), clicks AS (
        SELECT date_trunc('microsecond', ts) AS ts,
               CAST(value AS DOUBLE) AS value
        FROM events WHERE event_type = 'click'
    )
    SELECT i.incident_id,
           CAST(COUNT(*) AS BIGINT) AS n_clicks,
           CAST(SUM(c.value) AS DOUBLE) AS click_value
    FROM incidents i
    JOIN clicks c ON c.ts >= i.start_ts AND c.ts < i.end_ts
    GROUP BY i.incident_id
    """,
)
def ts_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: click activity inside the 30-minute window after
    each error event. The DuckDB oracle states the semantics as a plain
    non-equi `ON ts >= start AND ts < end` join; the Spark plan is the
    bucketized equi-join (`ts_ops.range_join`) — interval rows exploded
    across the 30-min buckets they span, one hash shuffle on the bucket
    key, residual window filter — because Spark would otherwise fall
    back to BroadcastNestedLoopJoin for the inequality condition."""
    ev = load_views(spark, sf_dir)["events"]
    incidents = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").cast("bigint").alias("incident_id"),
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("end_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "ts", F.col("value").cast("double").alias("value")
    )
    pairs = ts_ops.range_join(
        clicks, incidents, left_ts="ts", start="start_ts", end="end_ts",
        bucket_s=1800,
    )
    return pairs.groupBy("incident_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clicks"),
        F.sum("value").cast("double").alias("click_value"),
    )


# EWMA constants shared by the Spark plan and the oracle so BOTH engines
# parse the exact same decimal literals (bit-identical doubles).
_EWMA_ALPHA = "0.3"
_EWMA_BETA = "0.7"  # == repr(1.0 - 0.3); asserted in tests
_EWMA_ROWS = 20


@register(
    "ts_ewma_smooth",
    oracle=f"""
    WITH s AS (
        SELECT CAST(user_id AS BIGINT) AS guid,
               date_trunc('microsecond', ts) AS ts,
               CAST(value AS DOUBLE) AS value,
               CAST(event_id AS BIGINT) AS event_id
        FROM events
    ), lv AS (
        SELECT guid, ts, value,
               list(value) OVER (PARTITION BY guid ORDER BY ts, event_id
                    ROWS BETWEEN {_EWMA_ROWS - 1} PRECEDING AND CURRENT ROW)
                 AS vals
        FROM s
    )
    SELECT guid, CAST(epoch_us(ts) AS BIGINT) AS ts_us, value,
           list_reduce(vals, (acc, x) ->
               CAST({_EWMA_ALPHA} AS DOUBLE) * x
               + CAST({_EWMA_BETA} AS DOUBLE) * acc) AS ewma
    FROM lv
    """,
)
def ts_ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series truncated EWMA (alpha=0.3 over the last 20 samples).
    Both engines LEFT-FOLD the identical ordered value list with the
    identical decimal literals, so the doubles match bit-for-bit; the
    truncation is what bounds per-row state at scale (see
    `timeseries.ewma`)."""
    tables = load_views(spark, sf_dir)
    samples = tables["events"].select(
        F.col("user_id").cast("bigint").alias("guid"),
        "ts",
        F.col("value").cast("double").alias("value"),
        F.col("event_id").cast("bigint").alias("event_id"),
    )
    out = ts_ops.ewma(
        samples, alpha=_EWMA_ALPHA, window_rows=_EWMA_ROWS
    )
    return out.select(
        "guid", epoch_us("ts").alias("ts_us"), "value", "ewma"
    )


@register(
    "ts_anomaly_mad",
    oracle="""
    WITH s AS (
        SELECT CAST(user_id AS BIGINT) AS guid,
               date_trunc('microsecond', ts) AS ts,
               CAST(value AS DOUBLE) AS value,
               CAST(event_id AS BIGINT) AS event_id
        FROM events
    ), r1 AS (
        SELECT *,
               ROW_NUMBER() OVER (PARTITION BY guid ORDER BY value, event_id)
                 AS rn1,
               CAST(CEIL(COUNT(*) OVER (PARTITION BY guid) * 0.5) AS BIGINT)
                 AS mr
        FROM s
    ), m1 AS (
        SELECT *, MAX(CASE WHEN rn1 = mr THEN value END)
                    OVER (PARTITION BY guid) AS med
        FROM r1
    ), d AS (
        SELECT *, ABS(value - med) AS absdev FROM m1
    ), r2 AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY guid ORDER BY absdev, event_id)
                    AS rn2
        FROM d
    ), m2 AS (
        SELECT *, MAX(CASE WHEN rn2 = mr THEN absdev END)
                    OVER (PARTITION BY guid) AS mad
        FROM r2
    )
    SELECT guid, CAST(epoch_us(ts) AS BIGINT) AS ts_us, value,
           med, absdev, mad
    FROM m2
    WHERE absdev > CAST(3.0 AS DOUBLE) * 1.4826 * mad
    """,
)
def ts_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-series outliers: |x - median| > 3 * 1.4826 * MAD, with
    DISCRETE rank-based medians (the `exact_percentiles` convention) so
    both engines select the same element instead of interpolating
    (see `timeseries.mad_anomalies`)."""
    tables = load_views(spark, sf_dir)
    samples = tables["events"].select(
        F.col("user_id").cast("bigint").alias("guid"),
        "ts",
        F.col("value").cast("double").alias("value"),
        F.col("event_id").cast("bigint").alias("event_id"),
    )
    out = ts_ops.mad_anomalies(samples, k="3.0")
    return out.filter(F.col("is_anomaly")).select(
        "guid",
        epoch_us("ts").alias("ts_us"),
        "value",
        "med",
        "absdev",
        "mad",
    )


# Alert thresholds shared by the Spark plan and the oracle (identical
# decimal literals -> identical doubles in both engines).
_ALERT_HIGH = "200.0"
_ALERT_LOW = "100.0"


@register(
    "ts_threshold_alerts",
    oracle=f"""
    WITH s AS (
        SELECT CAST(user_id AS BIGINT) AS guid,
               date_trunc('microsecond', ts) AS ts,
               CAST(value AS DOUBLE) AS value,
               CAST(event_id AS BIGINT) AS event_id
        FROM events
    ), st AS (
        SELECT *,
               COALESCE(LAST_VALUE(
                   CASE WHEN value >= CAST({_ALERT_HIGH} AS DOUBLE) THEN 1
                        WHEN value <= CAST({_ALERT_LOW} AS DOUBLE) THEN 0
                   END IGNORE NULLS)
                 OVER (PARTITION BY guid ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 0) AS state
        FROM s
    ), tr AS (
        SELECT *,
               COALESCE(LAG(state) OVER (PARTITION BY guid
                                         ORDER BY ts, event_id), 0) AS prev
        FROM st
    )
    SELECT guid, CAST(epoch_us(ts) AS BIGINT) AS ts_us, value,
           CASE WHEN state = 1 THEN 'raise' ELSE 'clear' END AS alert
    FROM tr WHERE state <> prev
    """,
)
def ts_threshold_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hysteresis alerting over the event series: raise at >= 200, clear
    at <= 100, dead band carries state; only transitions are emitted
    (see `timeseries.threshold_alerts` — LOCF state + lag compare, one
    guid exchange, output proportional to state CHANGES not samples)."""
    tables = load_views(spark, sf_dir)
    samples = tables["events"].select(
        F.col("user_id").cast("bigint").alias("guid"),
        "ts",
        F.col("value").cast("double").alias("value"),
        F.col("event_id").cast("bigint").alias("event_id"),
    )
    out = ts_ops.threshold_alerts(samples, high=_ALERT_HIGH, low=_ALERT_LOW)
    return out.select(
        "guid", epoch_us("ts").alias("ts_us"), "value", "alert"
    )


@register(
    "ts_seasonal_baseline",
    oracle="""
    WITH s AS (
        SELECT event_type, CAST(hour(ts) AS INTEGER) AS hod,
               CAST(value AS DOUBLE) AS value
        FROM events
    ),
    base AS (
        SELECT event_type, hod,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(FLOOR(value * 1000.0) AS BIGINT)) AS BIGINT)
                   AS sum_milli
        FROM s GROUP BY event_type, hod
    ),
    dev AS (
        SELECT s.event_type, s.hod,
               CASE WHEN s.value >
                    1.5 * (CAST(b.sum_milli AS DOUBLE)
                           / CAST(b.n AS DOUBLE) / 1000.0)
                    THEN 1 ELSE 0 END AS above
        FROM s JOIN base b
          ON s.event_type = b.event_type AND s.hod = b.hod
    )
    SELECT b.event_type, b.hod, b.n, b.sum_milli,
           CAST(b.sum_milli AS DOUBLE) / CAST(b.n AS DOUBLE) / 1000.0
               AS seasonal_mean,
           CAST(SUM(d.above) AS BIGINT) AS n_above
    FROM base b JOIN dev d ON b.event_type = d.event_type AND b.hod = d.hod
    GROUP BY b.event_type, b.hod, b.n, b.sum_milli
    """,
)
def ts_seasonal_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonal baseline per series — the profile an IoT
    monitoring stack learns before it can alarm on 'abnormal for 3 am'
    (the reference's TimeSeries layer stores raw samples; this is the
    analytics pass above it, same family as ts_anomaly_mad but keyed by
    SEASON not by global distribution). Per (event_type, hour-of-day):
    sample count, floor-scaled integer value sum (the engine-exact mean
    recipe — double SUM order is engine-dependent, int64 sums are not),
    the mean, and how many samples run >1.5x their own seasonal mean.

    Scale shape: one exchange for the 120-row baseline, which then
    BROADCASTS back onto the sample scan for the deviation pass — the
    samples are scanned twice but shuffled zero times for the deviation
    count; the only other exchange is the final 120-row re-group. At
    100 TB the baseline is still 120 rows — seasonality tables never
    grow with data."""
    tables = load_views(spark, sf_dir)
    s = tables["events"].select(
        "event_type",
        F.hour("ts").cast("int").alias("hod"),
        F.col("value").cast("double").alias("value"),
    )
    base = s.groupBy("event_type", "hod").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.floor(F.col("value") * 1000.0).cast("bigint"))
        .cast("bigint")
        .alias("sum_milli"),
    )
    mean = (
        F.col("sum_milli").cast("double") / F.col("n").cast("double") / F.lit(1000.0)
    )
    dev = (
        s.join(F.broadcast(base), ["event_type", "hod"])
        .select(
            "event_type",
            "hod",
            F.when(F.col("value") > F.lit(1.5) * mean, F.lit(1))
            .otherwise(F.lit(0))
            .alias("above"),
        )
        .groupBy("event_type", "hod")
        .agg(F.sum("above").cast("bigint").alias("n_above"))
    )
    return base.join(F.broadcast(dev), ["event_type", "hod"]).select(
        "event_type",
        "hod",
        "n",
        "sum_milli",
        mean.alias("seasonal_mean"),
        "n_above",
    )
