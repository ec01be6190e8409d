"""Event-time windowed aggregation with watermarks — the streaming
analytics layer the reference lacks entirely (SURVEY §2.9: "no
watermarks, no event-time windows, no late-data handling") and a core
capability of a Spark-first engine: late data is bounded by the
watermark, state is evicted automatically, and the same rollup columns
as the batch `rollup_by_interval` come out per window."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_rollup(
    stream: DataFrame,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    guid: str = "guid",
    ts: str = "ts",
    value: str = "value",
) -> DataFrame:
    """Per (key, event-time window) aggregates with late-data handling.

    - watermark bounds how late a sample may arrive and still update its
      window (and lets Spark drop completed window state);
    - output matches rollup_by_interval's columns so batch and streaming
      paths are interchangeable downstream.
    """
    v = F.col(value).cast("double")
    return (
        stream.withWatermark(ts, watermark)
        .groupBy(F.col(guid), F.window(F.col(ts), window))
        .agg(
            F.count("*").alias("n_samples"),
            F.min(v).alias("min_value"),
            F.max(v).alias("max_value"),
            F.min_by(v, F.col(ts)).alias("first_value"),
            F.max_by(v, F.col(ts)).alias("last_value"),
        )
        .select(
            guid,
            F.col("window.start").alias("bucket_start"),
            "n_samples",
            "min_value",
            "max_value",
            "first_value",
            "last_value",
        )
    )
