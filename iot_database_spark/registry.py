"""Central registry of driver-visible queries and their DuckDB oracles.

Every operator this engine claims from SURVEY.md §2 registers a named
query here: a callable (spark, sf_dir) -> DataFrame plus (where the
semantics are ANSI-SQL-expressible) an equivalent DuckDB SQL string.
The driver hash-compares both at sf0.01; `tests/test_oracle_parity.py`
runs the same comparison locally.

Column-name discipline: the driver sorts columns by name before hashing,
so the Spark DataFrame and the oracle SQL must produce identical column
names — alias everything on both sides.
"""

from __future__ import annotations

import weakref
from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a driver-visible query (and optional oracle SQL)."""

    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


# The driver evaluates registered queries in dict-iteration order and
# caps evaluation at the first 50, so this explicit priority list decides
# which queries get a driver row each round. Remaining queries follow in
# registration order. `python scripts/plan_rotation.py` derives the next
# round's ordering from the recorded CORRECTNESS_r*.json artifacts
# (reds first, then never-graded, then oldest-green-first).
#
# Round-10 window (exactly 50 slots) — `python scripts/plan_rotation.py
# --slots 50` output with one hand adjustment: the TWO decontamination
# queries whose SEMANTICS changed this round (band-bucket width cap in
# _decon_scored — r9 verdict #1; output values can differ from their
# r9-graded form wherever a bucket exceeds the cap) are pulled forward
# for immediate re-grading even though their r9 rows are the newest
# greens. Then the 48 r7-vintage greens, whose evidence is 3 rounds old
# at r10 grading — the window limit. That fills all 50 slots, so the two
# oldest r8 greens the planner proposed (join_part_promo_monthly,
# set_intersect) wait for r11 together with the other 45 r8 greens —
# all r8 evidence is 2 rounds old at r10, inside the limit, and r11's
# 50 slots cover all 47 with room to spare. (Historical note for window
# planning, r9 advice: the r9 comment's "38 r6 greens / four oldest r7"
# miscounted its own list — the r9 window actually held 37 r6-vintage
# greens, the 38th aging r6 green being the RETIRED
# dedup_ngram_jaccard_absolute, plus 2 r7 greens at the tail; the other
# 48 r7 greens are exactly the ones leading below.)
_PRIORITY: tuple[str, ...] = (
    "decontaminate_minhash",  # r9 green, SEMANTICS CHANGED r10 (bucket cap) - must re-grade
    "decontaminate_eval_leak_report",  # r9 green, SEMANTICS CHANGED r10 - must re-grade
    "filter_like",  # r7 green
    "filter_between_not",  # r7 green
    "sort_limit_offset",  # r7 green
    "take_last",  # r7 green
    "multi_key_sort",  # r7 green
    "q01_pricing_summary",  # r7 green
    "global_agg",  # r7 green
    "groupby_having",  # r7 green
    "distinct_op",  # r7 green
    "count_exists_minmax",  # r7 green
    "rollup_agg",  # r7 green
    "join2_orders_customer",  # r7 green
    "join3_customer_nation_region",  # r7 green
    "join4_revenue_by_nation",  # r7 green
    "join6_local_supplier_revenue",  # r7 green
    "include_children_agg",  # r7 green
    "semi_join_exists",  # r7 green
    "anti_join_not_exists",  # r7 green
    "set_union",  # r7 green
    "window_topk_per_group",  # r7 green
    "window_running_sum",  # r7 green
    "window_lag_delta",  # r7 green
    "dbref_include_missing",  # r7 green
    "any_all_quantifiers",  # r7 green
    "q03_shipping_priority",  # r7 green
    "correlated_scalar_subquery",  # r7 green
    "exact_percentiles",  # r7 green
    "window_range_frame",  # r7 green
    "window_rank_family",  # r7 green
    "q06_revenue_forecast",  # r7 green
    "sql_include_digest",  # r7 green
    "math_funcs",  # r7 green
    "iot_effective_value",  # r7 green
    "ts_locf_merge",  # r7 green
    "ts_resample_interp",  # r7 green
    "ts_asof_join",  # r7 green
    "ts_rollup_hourly",  # r7 green
    "ts_detect_gaps",  # r7 green
    "ts_rate_of_change",  # r7 green
    "chain_append",  # r7 green
    "dedup_exact",  # r7 green
    "text_fingerprint",  # r7 green
    "pipeline_clean_corpus",  # r7 green
    "pipeline_prepare_training_data",  # r7 green
    "corpus_pack_sequences",  # r7 green
    "search_bm25_topk",  # r7 green
    "search_hybrid_rrf",  # r7 green
    "stream_windowed_rollup",  # r7 green
)


def _ordered(src: dict[str, Any]) -> dict[str, Any]:
    out = {name: src[name] for name in _PRIORITY if name in src}
    out.update((name, v) for name, v in src.items() if name not in out)
    return out


def queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return _ordered(_QUERIES)


def oracles() -> dict[str, str]:
    _ensure_loaded()
    return _ordered(_ORACLES)


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    import importlib

    for mod in (
        "iot_database_spark.operators.relational",
        "iot_database_spark.operators.scalar_dialect",
        "iot_database_spark.operators.iotvalue_queries",
        "iot_database_spark.operators.timeseries_queries",
        "iot_database_spark.operators.blockchain_queries",
        "iot_database_spark.operators.vector_queries",
        "iot_database_spark.operators.dedup_queries",
        "iot_database_spark.operators.textstats_queries",
        "iot_database_spark.operators.curation_queries",
        "iot_database_spark.operators.quantize_queries",
        "iot_database_spark.operators.search_queries",
        "iot_database_spark.operators.nl_queries",
        "iot_database_spark.operators.streaming_queries",
        "iot_database_spark.operators.storage_queries",
    ):
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError:
            pass  # module not built yet (incremental rounds)
    _LOADED = True


# Weakly keyed by the session object so a stopped-and-recreated session
# can never collide with a dead one's id() (round-1 review finding); the
# value holds {"dirs": {sf_dir -> loaded tables}, "active": sf_dir}.
_VIEW_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict[str, Any]]" = (
    weakref.WeakKeyDictionary()
)


def load_views(spark: SparkSession, sf_dir: str) -> dict[str, Any]:
    """Register the testdata tables as temp views (memoized per session+dir:
    repeated query calls must not pay parquet-footer/schema reads again).

    View names are GLOBAL per session while the memo is per sf_dir, so a
    session that alternates between dirs (the test suite does; a driver
    grading two SFs would too) must RE-REGISTER the views whenever the
    active dir changes — otherwise a spark.sql()-built query silently
    reads the previous dir's tables while the returned DataFrame dict
    reads the right ones (a round-8 full-suite failure caught exactly
    that split). The per-session 'active' slot tracks which dir owns
    the view names; switching back re-registers (cheap:
    createOrReplaceTempView over already-built frames) without
    re-reading parquet footers."""
    # the active dir is tracked in its own slot, NOT as a magic key in
    # the dirs dict (r9 advice: an sf_dir literally named like the old
    # '_active' sentinel would have been read back as a table dict)
    per_session = _VIEW_CACHE.setdefault(spark, {"dirs": {}, "active": None})
    cached = per_session["dirs"].get(sf_dir)
    if cached is not None:
        if per_session["active"] != sf_dir:
            for name, df in cached.items():
                df.createOrReplaceTempView(name)
            _drop_absent_views(spark, cached)
            per_session["active"] = sf_dir
        return cached
    from iot_database_spark.session import load_tables

    out = load_tables(spark, sf_dir)
    _drop_absent_views(spark, out)
    per_session["dirs"][sf_dir] = out
    per_session["active"] = sf_dir
    return out


def _drop_absent_views(spark: SparkSession, present: dict[str, Any]) -> None:
    """Dirs can hold a SUBSET of the testdata tables (load_tables skips
    missing files silently — crafted test fixtures do this on purpose).
    Activating such a dir must also UNREGISTER the other tables' views:
    leaving them pointed at the previously active dir turns a missing
    table into a silent wrong-dir read for any spark.sql()-built query,
    where the correct outcome is TABLE_OR_VIEW_NOT_FOUND (r8 review
    finding — the dir-switch fix alone only re-pointed tables the new
    dir HAS)."""
    from iot_database_spark.session import TESTDATA_TABLES

    for name in TESTDATA_TABLES:
        if name not in present:
            spark.catalog.dropTempView(name)
