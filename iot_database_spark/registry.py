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
# Round-5 window (exactly 50 slots), per the r4 verdict: rotate to the
# 55 oracle-backed queries NOT graded in round 4, oldest evidence first,
# keeping the window fully DISJOINT from r4's 50 so every query's newest
# green driver row is at most two rounds old.
#
# 1. The 30 r2-vintage greens (their last driver evidence is round 2).
# 2. 20 of the 25 r3-vintage greens. Five r3 queries are left to local
#    verification (tests/test_oracle_parity.py runs the identical
#    hash-compare): set_intersect / set_except (same code path as the
#    r4-green set_union), cube_agg / grouping_sets_agg /
#    pivot_status_by_segment (same grouping-analytics path as the
#    r4-green rollup_agg) — the dropped five are exactly the ones whose
#    r4-green siblings exercise the same operators.
#
# Queries whose code changes THIS round (e.g. the dedup_ngram_jaccard
# perf rework) are deliberately NOT re-inserted here — that would break
# disjointness; they are re-proved by the local oracle-parity suite.
#
# ROUND-6 ROTATION PREP (computed at end of round 5 from the union of
# CORRECTNESS_r01..r04 plus this window): after r5 grades, 18 queries
# registered during round 5 have NEVER had a driver row (local
# oracle-parity green only) — approx_sketch_accuracy,
# cagg_incremental_refresh, ts_range_join, ts_ewma_smooth,
# ts_anomaly_mad, ts_threshold_alerts, dedup_ngram_jaccard_capped,
# text_strip_html, text_bpe_token_count (rows-only, no oracle),
# zorder_key_events, text_trigram_coverage, stream_rollup_to_table,
# stream_threshold_alerts, timetravel_asof_digest,
# evolution_nullfill_digest, txn_atomicity_digest, fk_cascade_digest,
# plus nl_find_include_nested (deliberate rows-only) — and 5 are
# r3-vintage (set_intersect, set_except, cube_agg, grouping_sets_agg,
# pivot_status_by_segment). The r6 window should lead with those 23 and
# fill the remaining 27 slots from the r4-graded set (then oldest-r5),
# keeping every query's newest green row at most two rounds old.
_PRIORITY: tuple[str, ...] = (
    # r2-vintage greens (oldest driver evidence)
    "scan_filter_project",
    "filter_in",
    "sort_limit_offset",
    "take_last",
    "q01_pricing_summary",
    "global_agg",
    "groupby_having",
    "string_funcs",
    "date_funcs",
    "json_extract",
    "iot_write_gating",
    "vector_cosine_topk",
    "vector_l2_topk",
    "vector_upsert_dedup",
    "ann_ivf_cosine",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "text_quality_scores",
    "text_token_count",
    "text_langid",
    "text_gopher_rules",
    "text_scrub_pii",
    "decontaminate_ngram_overlap",
    "embedding_outliers",
    "nl_find_filter_sort_limit",
    "nl_find_dual_join",
    "nl_find_dual_fk_inference",
    "nl_find_triple_join",
    "nl_find_include_digest",
    "remote_serialized_find",
    # r3-vintage greens
    "filter_like",
    "filter_between_not",
    "multi_key_sort",
    "distinct_op",
    "count_exists_minmax",
    "join2_orders_customer",
    "join3_customer_nation_region",
    "join4_revenue_by_nation",
    "join6_local_supplier_revenue",
    "include_children_agg",
    "anti_join_not_exists",
    "window_lag_delta",
    "dbref_include_missing",
    "any_all_quantifiers",
    "q03_shipping_priority",
    "correlated_scalar_subquery",
    "window_rank_family",
    "q06_revenue_forecast",
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
        "iot_database_spark.operators.storage_queries",
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
