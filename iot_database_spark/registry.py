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
# Round-6 window (exactly 50 slots), executing the rotation plan written
# at the end of round 5 and confirmed by the r5 verdict:
#
# 1. The 23 queries whose newest evidence is local-only or r3-vintage:
#    18 registered during round 5 with no driver row yet (incl. the two
#    deliberate rows-only checks text_bpe_token_count and
#    nl_find_include_nested) plus the 5 r3-vintage greens that sat out
#    rounds 4-5 (set_intersect, set_except, cube_agg, grouping_sets_agg,
#    pivot_status_by_segment).
# 2. The 3 queries whose semantics are new or changed THIS round and
#    therefore need fresh driver proof: dedup_ngram_jaccard (now
#    defaults to the fractional df guard), dedup_ngram_jaccard_absolute
#    (the old absolute-cap semantics under a new name), and
#    text_bpe_token_count_fixed (the new value-hash BPE gate).
# 3. 24 of the 50 r4-graded queries (now the oldest driver evidence),
#    preferring the ones whose code paths this round touched (the dedup
#    family) and leaving out exactly the ones whose in-window siblings
#    exercise the same operator (e.g. chain_append vs chain_verify,
#    dedup_exact vs the minhash/cluster path).
#
# After r6 grades: every query's newest green driver row is <= 2 rounds
# old (the 26 r4-graded queries left out are exactly 2 rounds old; all
# r5-graded are 1). ROUND-7 ROTATION PREP: lead with those 26 remaining
# r4-vintage queries (chain_append, dedup_exact, text_fingerprint,
# sql_include_digest, ts_locf_merge, ts_resample_interp, ts_asof_join,
# ts_rollup_hourly, ts_detect_gaps, ts_rate_of_change,
# stream_windowed_rollup, iot_effective_value, window_range_frame,
# math_funcs, search_bm25_topk, search_hybrid_rrf, pipeline_clean_corpus,
# pipeline_prepare_training_data, corpus_pack_sequences,
# window_topk_per_group, window_running_sum, rollup_agg, set_union,
# semi_join_exists, exact_percentiles) and fill the remaining 24 slots
# from the oldest of r5's 50.
_PRIORITY: tuple[str, ...] = (
    # -- never driver-graded: registered in round 5 (local parity green)
    "approx_sketch_accuracy",
    "cagg_incremental_refresh",
    "ts_range_join",
    "ts_ewma_smooth",
    "ts_anomaly_mad",
    "ts_threshold_alerts",
    "dedup_ngram_jaccard_capped",
    "text_strip_html",
    "text_bpe_token_count",
    "zorder_key_events",
    "text_trigram_coverage",
    "stream_rollup_to_table",
    "stream_threshold_alerts",
    "timetravel_asof_digest",
    "evolution_nullfill_digest",
    "txn_atomicity_digest",
    "fk_cascade_digest",
    "nl_find_include_nested",
    # -- r3-vintage greens that sat out rounds 4-5
    "set_intersect",
    "set_except",
    "cube_agg",
    "grouping_sets_agg",
    "pivot_status_by_segment",
    # -- new or semantics-changed in round 6
    "dedup_ngram_jaccard",
    "dedup_ngram_jaccard_absolute",
    "text_bpe_token_count_fixed",
    # -- r4-graded refresh (oldest driver evidence)
    "dedup_minhash_lsh",
    "dedup_cluster_assign",
    "dedup_repeated_ngrams",
    "dedup_fuzzy_name_match",
    "stream_exact_dedup",
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
    "text_chunk_windows",
    "corpus_train_val_test_split",
    "corpus_mixture_sample",
    "heavy_hitter_ngrams",
    "ann_lsh_cosine",
    "text_quality_classifier",
    "join_part_promo_monthly",
    "chain_verify",
    "unit_convert_bulk",
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
