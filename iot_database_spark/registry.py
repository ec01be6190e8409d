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

# oracle values are SQL strings, or zero-arg callables producing one —
# the lazy form exists for oracles parameterized by call-time state
# (e.g. SPARK_GRAFT_DECON_EVAL_PATH, resolved when the driver asks for
# the oracle rather than baked at import — r12 verdict task #5)
_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, "str | Callable[[], str]"] = {}


def register(
    name: str, oracle: "str | Callable[[], str] | None" = None
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a driver-visible query (and optional oracle
    SQL — a string, or a zero-arg callable resolved at oracles() time)."""

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
# Round-13 window (exactly 50 slots) — the planner's output verbatim.
# This round exercises the RETIREMENT policy for real (r12 verdict task
# #6): dedup_substring_suffix is newly registered (the sorted-suffix
# variable-length substring profile), which under the saturated 150-slot
# rotation required retiring plan_rotation.RETIREMENT_CANDIDATES[0]
# (text_ngram_lm_score — its plan stays driver-graded via the trigram
# twin; bit-exact local gate in test_retired_query_parity). Registry
# stays at exactly 150 = capacity.
#   - dedup_substring_suffix leads (never graded — needs first-time
#     evidence).
#   - 49 of the 50 r10-vintage greens fill the rest; the displaced one
#     (stream_windowed_rollup, last of them in registration order) hits
#     the 3-round age limit during r13 and MUST lead the r14 window —
#     the same deferral arithmetic as the r8 pair the r12 window
#     closed.
# SATURATION: at 150 registered queries, a 50-slot window, and the
# 3-round evidence-age limit, the rotation is exactly full with ZERO
# slack. Steady state: r14 = stream_windowed_rollup + the r11 greens
# (one of which defers a round by the same arithmetic), r15 = the r12
# greens. Any NEW registration (or same-round re-grade after a
# semantics change) needs a slot freed by RETIRING a query first — the
# policy is mechanical: scripts/plan_rotation.py (r11 verdict task #6).
_PRIORITY: tuple[str, ...] = (
    "dedup_substring_suffix",  # never graded
    "filter_like",  # r10 green
    "filter_between_not",  # r10 green
    "sort_limit_offset",  # r10 green
    "take_last",  # r10 green
    "multi_key_sort",  # r10 green
    "q01_pricing_summary",  # r10 green
    "global_agg",  # r10 green
    "groupby_having",  # r10 green
    "distinct_op",  # r10 green
    "count_exists_minmax",  # r10 green
    "rollup_agg",  # r10 green
    "join2_orders_customer",  # r10 green
    "join3_customer_nation_region",  # r10 green
    "join4_revenue_by_nation",  # r10 green
    "join6_local_supplier_revenue",  # r10 green
    "include_children_agg",  # r10 green
    "semi_join_exists",  # r10 green
    "anti_join_not_exists",  # r10 green
    "set_union",  # r10 green
    "window_topk_per_group",  # r10 green
    "window_running_sum",  # r10 green
    "window_lag_delta",  # r10 green
    "dbref_include_missing",  # r10 green
    "any_all_quantifiers",  # r10 green
    "q03_shipping_priority",  # r10 green
    "correlated_scalar_subquery",  # r10 green
    "exact_percentiles",  # r10 green
    "window_range_frame",  # r10 green
    "window_rank_family",  # r10 green
    "q06_revenue_forecast",  # r10 green
    "sql_include_digest",  # r10 green
    "math_funcs",  # r10 green
    "iot_effective_value",  # r10 green
    "ts_locf_merge",  # r10 green
    "ts_resample_interp",  # r10 green
    "ts_asof_join",  # r10 green
    "ts_rollup_hourly",  # r10 green
    "ts_detect_gaps",  # r10 green
    "ts_rate_of_change",  # r10 green
    "chain_append",  # r10 green
    "dedup_exact",  # r10 green
    "decontaminate_minhash",  # r10 green
    "decontaminate_eval_leak_report",  # r10 green
    "text_fingerprint",  # r10 green
    "pipeline_clean_corpus",  # r10 green
    "pipeline_prepare_training_data",  # r10 green
    "corpus_pack_sequences",  # r10 green
    "search_bm25_topk",  # r10 green
    "search_hybrid_rrf",  # r10 green
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
    return {
        name: (v() if callable(v) else v)
        for name, v in _ordered(_ORACLES).items()
    }


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
