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
# Round-11 window (exactly 50 slots). The planner's raw oldest-first
# list is 46 r8-vintage greens + r9 tail; the hand adjustments, with the
# arithmetic shown because r10's "47 r8 greens" note was off by one:
#   - 5 NEVER-GRADED queries lead: the three r10-staged operators
#     (dedup_span_exact, corpus_quality_resample, search_phrase_topk —
#     operators/staged_r11.py dissolved into their home modules this
#     round) plus the two new r11 builds (dedup_span_removal — r10
#     verdict #3; decontaminate_fixed_eval — r10 verdict #4).
#   - dedup_fuzzy_name_match follows: its registered shape changed r10
#     (_FUZZY_MAX_BLOCK cap) and the repo's rule is semantics-changed
#     queries re-grade in the NEXT window (r10 verdict finding #1).
#   - 44 of the 46 r8-vintage greens fill the rest. 5 + 1 + 44 = 50, so
#     TWO r8 greens must wait: stream_sessionization and
#     stream_stream_time_join (the planner's tail two; code untouched
#     since r8, suite-tested green every round) defer to r12, where the
#     arithmetic closes exactly — 48 remaining r9-vintage greens
#     (49 minus fuzzy, re-graded here) + these 2 = 50. The alternative
#     (staging the two r11 builds like r10 did) was rejected: r10's
#     verdict required both new operators to land a CORRECTNESS_r11 row.
#
# SATURATION NOTE for r12+: at 150 registered queries and a 50-slot
# window the rotation is exactly full — steady state grades each cohort
# every 3rd round (r12 = 48 r9 + 2 r8; r13 = the 50 r10 greens; r14 =
# the 50 r11 greens; ...), which holds every query at the <=3-rounds-old
# evidence limit with ZERO slack. Any future registration needs a
# same-round slot, which now requires RETIRING a query first (the
# dedup_ngram_jaccard_absolute precedent: keep the library function +
# the bit-exact local gate, drop the driver row). New capabilities that
# don't need a driver row should land as library + suite evidence
# (MinHashIndex / QuantizedStore / framestore precedent) instead.
_PRIORITY: tuple[str, ...] = (
    "dedup_span_exact",  # never graded (staged r10, registered r11)
    "corpus_quality_resample",  # never graded (staged r10, registered r11)
    "search_phrase_topk",  # never graded (staged r10, registered r11)
    "dedup_span_removal",  # never graded (new r11 — r10 verdict #3)
    "decontaminate_fixed_eval",  # never graded (new r11 — r10 verdict #4)
    "dedup_fuzzy_name_match",  # r9 green, SEMANTICS CHANGED r10 (max_block cap) - must re-grade
    "join_part_promo_monthly",  # r8 green
    "set_intersect",  # r8 green
    "set_except",  # r8 green
    "cube_agg",  # r8 green
    "pivot_status_by_segment",  # r8 green
    "grouping_sets_agg",  # r8 green
    "event_sessionization",  # r8 green
    "skew_salted_agg",  # r8 green
    "event_funnel",  # r8 green
    "event_cohort_retention",  # r8 green
    "approx_sketch_accuracy",  # r8 green
    "event_transition_matrix",  # r8 green
    "string_funcs",  # r8 green
    "string_format_regex",  # r8 green
    "date_funcs",  # r8 green
    "json_extract",  # r8 green
    "iot_write_gating",  # r8 green
    "ts_seasonal_baseline",  # r8 green
    "vector_cosine_topk",  # r8 green
    "vector_l2_topk",  # r8 green
    "vector_upsert_dedup",  # r8 green
    "ann_ivf_cosine",  # r8 green
    "ann_two_stage_rerank",  # r8 green
    "dedup_simhash",  # r8 green
    "dedup_embedding_cosine",  # r8 green, max_block cap added r10 (no-op at graded SFs - tests/test_span_ops.py enforces)
    "text_quality_scores",  # r8 green
    "text_token_count",  # r8 green
    "text_langid",  # r8 green
    "text_gopher_rules",  # r8 green
    "text_scrub_pii",  # r8 green
    "decontaminate_ngram_overlap",  # r8 green
    "embedding_outliers",  # r8 green
    "text_repetition_trim",  # r8 green
    "corpus_zipf_stats",  # r8 green
    "dedup_url_canonical",  # r8 green
    "pipeline_web_ingest",  # r8 green
    "embedding_quantize_int8",  # r8 green
    "ann_int8_cosine",  # r8 green
    "nl_find_filter_sort_limit",  # r8 green
    "nl_find_dual_join",  # r8 green
    "nl_find_dual_fk_inference",  # r8 green
    "nl_find_triple_join",  # r8 green
    "nl_find_include_digest",  # r8 green
    "remote_serialized_find",  # r8 green
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
