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
# Round-4 window (exactly 50 slots):
# 1. The 19 oracle-backed queries that have NEVER had a green driver row
#    in any round (r3 verdict's explicit list), led by the re-graded
#    event_sessionization (r3's lone red row, oracle SUM now cast to
#    BIGINT) — closing the ever-driver-green gap to 104/104.
# 2. Every query whose code changed this round must re-prove green:
#    the LSH pair-generation restructure (dedup_minhash_lsh,
#    dedup_cluster_assign, dedup_ngram_jaccard), the
#    join_part_promo_monthly broadcast pin, the epoch_us_sql NTZ-cast
#    symmetry fix (chain_append, chain_verify), the spread_small_input
#    caching (dedup_exact, text_fingerprint), and the new unit-catalog /
#    SQL-INCLUDE queries.
# 3. Backfill with the r3-green families most recently touched
#    (timeseries, search, pipelines) so regressions surface.
_PRIORITY: tuple[str, ...] = (
    # never-driver-graded (r3 verdict list) + re-graded sessionization
    "event_sessionization",
    "skew_salted_agg",
    "string_format_regex",
    "conditional_cast",
    "array_higher_order",
    "try_cast_predicates",
    "sha256_hash",
    "map_functions",
    "iot_password_hash",
    "vector_l2_radius",
    "dedup_repeated_ngrams",
    "dedup_fuzzy_name_match",
    "text_chunk_windows",
    "corpus_train_val_test_split",
    "corpus_mixture_sample",
    "heavy_hitter_ngrams",
    "ann_lsh_cosine",
    "text_quality_classifier",
    "stream_exact_dedup",
    # code changed this round: must re-prove
    "dedup_minhash_lsh",
    "dedup_cluster_assign",
    "dedup_ngram_jaccard",
    "join_part_promo_monthly",
    "chain_append",
    "chain_verify",
    "dedup_exact",
    "text_fingerprint",
    "unit_convert_bulk",
    "sql_include_digest",
    # r3-green backfill: most recently touched families
    "ts_locf_merge",
    "ts_resample_interp",
    "ts_asof_join",
    "ts_rollup_hourly",
    "ts_detect_gaps",
    "ts_rate_of_change",
    "stream_windowed_rollup",
    "iot_effective_value",
    "window_range_frame",
    "math_funcs",
    "search_bm25_topk",
    "search_hybrid_rrf",
    "pipeline_clean_corpus",
    "pipeline_prepare_training_data",
    "corpus_pack_sequences",
    "window_topk_per_group",
    "window_running_sum",
    "rollup_agg",
    "set_union",
    "semi_join_exists",
    "exact_percentiles",
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
