"""Time-series reads: LOCF priority-merge and grid resampling with linear
interpolation — the reference's delta-T store read path re-expressed as
window functions.

Reference semantics (Iot.Database/TimeSeries/TsCollection.cs):
- Storage: delta-encoded int milliseconds per 20-day group
  (BaseDeltaT/BaseValue.cs:16-31). We store raw (guid, ts, priority, value)
  rows in Parquet instead — Parquet's own delta/dictionary encodings make
  the hand-rolled compression unnecessary, and a long/narrow layout
  partitions by (date, guid-bucket) at 100 TB.
- Get(start, end) (:130-185): merge all priority slots into one event
  stream where each event carries every slot's last-observed value
  (LOCF across priorities), effective value = highest-priority non-null.
- Get(start, end, interval) (:188-233): walk a fixed grid; for each grid
  point take nearest-before/nearest-after samples; numeric values get
  linear interpolation (ValueInterpolated flag set), non-numeric or
  one-sided fill forward; grid points before the first sample are skipped.
  (The reference's AddMilliseconds accumulation bug at :217 is NOT
  replicated — we implement the documented intent: a regular grid.)

All operators below are pure DataFrame transformations: one shuffle on
guid (window partition), no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def locf_merge(
    writes: DataFrame,
    guid: str = "guid",
    ts: str = "ts",
    priority: str = "priority",
    value: str = "value",
    priorities: tuple[int, ...] = tuple(range(1, 17)),
    tiebreak: str | None = None,
) -> DataFrame:
    """Priority-merged LOCF event stream (TsCollection.cs:163-181).

    For every write event, emit the full slot vector as-of that event:
    slot p = last value written at priority p up to and including this ts.
    `value` = effective (lowest-numbered non-null slot), `eff_priority`
    its slot number.
    """
    order = [F.col(ts)] + ([F.col(tiebreak)] if tiebreak else [])
    w = (
        W.partitionBy(guid)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    slot_cols = [
        F.last(
            F.when(F.col(priority) == p, F.col(value)), ignorenulls=True
        ).over(w).alias(f"slot_{p}")
        for p in priorities
    ]
    slots = writes.select(guid, ts, priority, value, *slot_cols)
    eff = F.coalesce(*[F.col(f"slot_{p}") for p in priorities])
    eff_p = F.coalesce(
        *[
            F.when(F.col(f"slot_{p}").isNotNull(), F.lit(p))
            for p in priorities
        ]
    )
    return slots.withColumn("eff_value", eff).withColumn("eff_priority", eff_p)


def resample(
    samples: DataFrame,
    start: Column | str,
    end: Column | str,
    interval: str,
    guid: str = "guid",
    ts: str = "ts",
    value: str = "value",
) -> DataFrame:
    """Fixed-grid resample with linear interpolation (TsCollection.cs:188-233).

    Output one row per (guid, grid_ts) with:
      value         — sample value if one lands exactly on the grid point,
                      else linear interpolation between nearest before/after
                      numeric samples, else fill-forward
      interpolated  — true iff the value was linearly interpolated
                      (the ValueInterpolated flag, IotValueFlags.cs)
    Grid points before a series' first sample are skipped (reference
    skips until data exists).

    Plan shape: grid rows are unioned with samples and resolved with two
    windows (last-before / first-after) — a single shuffle on guid; the
    grid explode is O(#guids x #points) rows, never driver-side.
    """
    start_c = F.lit(start).cast("timestamp") if isinstance(start, str) else start
    end_c = F.lit(end).cast("timestamp") if isinstance(end, str) else end

    guids = samples.select(guid).distinct()
    grid = guids.select(
        guid,
        F.explode(
            F.sequence(start_c, end_c, F.expr(f"INTERVAL {interval}"))
        ).alias("grid_ts"),
    )

    s = samples.select(
        F.col(guid).alias(guid),
        F.col(ts).alias("grid_ts"),
        F.col(value).cast("double").alias("_v"),
        F.lit(1).alias("_is_sample"),
    )
    g = grid.select(
        guid, "grid_ts", F.lit(None).cast("double").alias("_v"), F.lit(0).alias("_is_sample")
    )
    both = s.unionByName(g)

    # at equal ts, order samples before grid points so "last before or at"
    # sees a co-located sample
    w_before = (
        W.partitionBy(guid)
        .orderBy(F.col("grid_ts"), F.col("_is_sample").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_after = (
        W.partitionBy(guid)
        .orderBy(F.col("grid_ts"), F.col("_is_sample").desc())
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    sample_ts = F.when(F.col("_is_sample") == 1, F.col("grid_ts"))
    resolved = (
        both.withColumn("prev_v", F.last("_v", ignorenulls=True).over(w_before))
        .withColumn("prev_ts", F.last(sample_ts, ignorenulls=True).over(w_before))
        .withColumn("next_v", F.first("_v", ignorenulls=True).over(w_after))
        .withColumn("next_ts", F.first(sample_ts, ignorenulls=True).over(w_after))
        .filter(F.col("_is_sample") == 0)
        .filter(F.col("prev_ts").isNotNull())  # skip before first sample
    )

    exact = F.col("prev_ts") == F.col("grid_ts")
    interpolable = (
        F.col("next_ts").isNotNull()
        & (F.col("next_ts") != F.col("prev_ts"))
        & F.col("prev_v").isNotNull()
        & F.col("next_v").isNotNull()
    )
    frac = (
        (F.unix_micros(F.col("grid_ts")) - F.unix_micros(F.col("prev_ts"))).cast("double")
        / (F.unix_micros(F.col("next_ts")) - F.unix_micros(F.col("prev_ts"))).cast("double")
    )
    interp = F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * frac

    return resolved.select(
        guid,
        "grid_ts",
        F.when(exact, F.col("prev_v"))
        .when(interpolable, interp)
        .otherwise(F.col("prev_v"))
        .alias("value"),
        (~exact & interpolable).alias("interpolated"),
    )
