"""Storage layout — the engine's substitute for the reference's
skip-list indexes (LiteDB/Engine/Services/IndexService.cs) and its
EnsureIndex/expression-index DDL (Table/TableCollection.cs:535-591).

In a columnar warehouse the "index" is the physical layout:

- **date partitioning** of time-series logs -> partition pruning at the
  scan (the equivalent of the reference's index range scan on ts)
- **key bucketing** (hash(guid) % n as a partition column) -> co-located
  per-device reads and shuffle-free per-bucket work
- **sort-within-partitions on (guid, ts)** -> parquet row-group min/max
  stats make per-guid range scans skip row groups (the equivalent of the
  reference's per-field skip lists)

`write_timeseries_layout` applies all three; `tests/test_layout.py`
asserts the pruning actually shows up in the physical plan
(PartitionFilters), which is the contract that keeps a 100 TB scan
touching only the partitions a query needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Bound row groups in every writer (r9 verdict #2's lesson applied to
# the engine's own writers, not just the scale-data generator): Spark
# parallelizes a parquet scan by BYTE-RANGE SPLITS OVER ROW GROUPS, so
# one giant row group = one scan task no matter how many executors a
# cluster has. 32 MB keeps ~4 groups per default 128 MB split —
# negligible footer/stats overhead, full split freedom, and finer
# min/max pruning granularity for the sorted/Z-ordered layouts below.
ROW_GROUP_BYTES = 32 * 1024 * 1024


def write_timeseries_layout(
    df: DataFrame,
    path: str,
    ts_col: str = "ts",
    key_col: str = "guid",
    n_buckets: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write a time-series log partitioned by (event date, key bucket) and
    sorted by (key, ts) within partitions."""
    out = (
        df.withColumn("p_date", F.to_date(F.col(ts_col)))
        .withColumn(
            "p_bucket", F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets))
        )
        .repartition("p_date", "p_bucket")
        # prefix the sort with the write's partition columns: the dynamic
        # partition writer requires ordering by them and would otherwise
        # inject its own (unstable) sort, destroying the (key, ts) order
        .sortWithinPartitions("p_date", "p_bucket", key_col, ts_col)
    )
    out.write.mode(mode).option(
        "parquet.block.size", str(ROW_GROUP_BYTES)
    ).partitionBy("p_date", "p_bucket").parquet(path)


def read_timeseries_layout(spark: SparkSession, path: str) -> DataFrame:
    """Read the layout back; date/bucket predicates prune partitions."""
    return spark.read.parquet(path)


def bucket_for(key_value, n_buckets: int = 16):
    """Column expression for the bucket of a literal key — push this into
    the filter so the scan prunes to one bucket directory."""
    return F.pmod(F.xxhash64(F.lit(key_value)), F.lit(n_buckets))


def zorder_value(
    df: DataFrame, columns: list[str], bits: int = 16
) -> tuple[DataFrame, str]:
    """Attach a Z-order (Morton) key interleaving `columns` — the layout
    that lets min/max row-group stats prune on EVERY clustered column,
    not just the leading sort key (Delta `OPTIMIZE ZORDER BY`).

    Each column is linearly quantized to `bits` bits between its min and
    max (one tiny agg, broadcast as literals), then the bit planes are
    interleaved with plain integer shift/mask expressions — JVM-side,
    no UDF. Linear (value-based) quantization is the cheap variant:
    heavily skewed columns would want rank-based quantization (a global
    sort per column) — the clustering contract (narrow per-file min/max
    on every column) is identical. Returns (df + key, key column name).
    """
    stats = df.agg(
        *[F.min(c).cast("double").alias(f"_lo_{c}") for c in columns],
        *[F.max(c).cast("double").alias(f"_hi_{c}") for c in columns],
    ).collect()[0]
    levels = (1 << bits) - 1
    quantized = []
    for c in columns:
        lo, hi = stats[f"_lo_{c}"], stats[f"_hi_{c}"]
        span = (hi - lo) or 1.0
        quantized.append(
            F.least(
                F.lit(levels),
                F.floor(
                    (F.col(c).cast("double") - F.lit(lo)) / F.lit(span) * levels
                ).cast("bigint"),
            )
        )
    n = len(columns)
    z = F.lit(0).cast("bigint")
    for bit in range(bits):
        for j, q in enumerate(quantized):
            z = z + F.shiftright(q, bit).bitwiseAND(F.lit(1)) * F.lit(
                1 << (bit * n + j)
            ).cast("bigint")
    return df.withColumn("_zorder", z), "_zorder"


def write_zordered(
    df: DataFrame,
    path: str,
    columns: list[str],
    n_files: int = 8,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Rewrite `df` Z-ordered on `columns`: range-partition + sort by
    the Morton key so every output file covers a small hyper-rectangle
    of the clustered space — point/range filters on ANY of the columns
    skip most files via parquet min/max stats (asserted per-file in
    tests/test_layout.py)."""
    out, key = zorder_value(df, columns, bits)
    (
        out.repartitionByRange(n_files, F.col(key))
        .sortWithinPartitions(key)
        .drop(key)
        .write.mode(mode)
        .option("parquet.block.size", str(ROW_GROUP_BYTES))
        .parquet(path)
    )


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    """Bucketed table write — the co-located-join layout: two tables
    bucketed by the same key with the same bucket count join WITHOUT a
    shuffle (Catalyst sees compatible output partitioning). This is the
    'EnsureIndex on the join key' of the columnar world."""
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .option("parquet.block.size", str(ROW_GROUP_BYTES))
        .bucketBy(n_buckets, bucket_col)
    )
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)
