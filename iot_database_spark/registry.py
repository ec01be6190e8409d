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
# registration order.
#
# Round-3 window (two goals, exactly 50 slots):
# 1. Every query whose code or oracle changed this round must re-prove
#    green: the NTZ-timestamp family (ts_*, chain_*, stream_windowed_
#    rollup, iot_effective_value, event_sessionization, window_range_
#    frame) and the five oracle-type-cast fixes (math_funcs,
#    search_bm25_topk + search_hybrid_rrf which shares the BM25 oracle,
#    pipeline_clean_corpus, pipeline_prepare_training_data,
#    corpus_pack_sequences) — 18 slots.
# 2. The relational core — every join, window function, set op, rollup/
#    cube/pivot/grouping-sets, subquery, percentile, funnel — had ZERO
#    historical green driver rows (round 1 they ERR'd on the nanos bug,
#    round 2 they sat outside the window). All 32 take the remaining
#    slots. The r2-green-and-unchanged text_*/dedup_*/vector_*/nl_*
#    families cede their slots; their green r02 rows stand as evidence.
_PRIORITY: tuple[str, ...] = (
    # changed this round: NTZ-timestamp family
    "ts_locf_merge",
    "ts_resample_interp",
    "ts_asof_join",
    "ts_rollup_hourly",
    "ts_detect_gaps",
    "ts_rate_of_change",
    "stream_windowed_rollup",
    "chain_append",
    "chain_verify",
    "iot_effective_value",
    "event_sessionization",
    "window_range_frame",
    # changed this round: oracle type-cast fixes
    "math_funcs",
    "search_bm25_topk",
    "search_hybrid_rrf",
    "pipeline_clean_corpus",
    "pipeline_prepare_training_data",
    "corpus_pack_sequences",
    # relational core: scans / filters / sorts
    "filter_like",
    "filter_between_not",
    "multi_key_sort",
    "distinct_op",
    "count_exists_minmax",
    # aggregation supersets
    "rollup_agg",
    "cube_agg",
    "grouping_sets_agg",
    "pivot_status_by_segment",
    # joins
    "join2_orders_customer",
    "join3_customer_nation_region",
    "join4_revenue_by_nation",
    "join6_local_supplier_revenue",
    "join_part_promo_monthly",
    "include_children_agg",
    "semi_join_exists",
    "anti_join_not_exists",
    "dbref_include_missing",
    # set operations
    "set_union",
    "set_intersect",
    "set_except",
    # window functions
    "window_topk_per_group",
    "window_running_sum",
    "window_lag_delta",
    "window_rank_family",
    # predicates / subqueries / analytics
    "any_all_quantifiers",
    "q03_shipping_priority",
    "q06_revenue_forecast",
    "correlated_scalar_subquery",
    "exact_percentiles",
    "event_funnel",
    "event_cohort_retention",
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
        "iot_database_spark.operators.search_queries",
        "iot_database_spark.operators.nl_queries",
        "iot_database_spark.operators.streaming_queries",
    ):
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError:
            pass  # module not built yet (incremental rounds)
    _LOADED = True


# Weakly keyed by the session object so a stopped-and-recreated session
# can never collide with a dead one's id() (round-1 review finding); the
# value maps sf_dir -> loaded tables for that session.
_VIEW_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict[str, dict[str, Any]]]" = (
    weakref.WeakKeyDictionary()
)


def load_views(spark: SparkSession, sf_dir: str) -> dict[str, Any]:
    """Register the testdata tables as temp views (memoized per session+dir:
    repeated query calls must not pay parquet-footer/schema reads again)."""
    per_session = _VIEW_CACHE.setdefault(spark, {})
    cached = per_session.get(sf_dir)
    if cached is not None:
        return cached
    from iot_database_spark.session import load_tables

    out = load_tables(spark, sf_dir)
    per_session[sf_dir] = out
    return out
