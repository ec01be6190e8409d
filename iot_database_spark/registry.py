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
# Round-12 window (exactly 50 slots) — the planner's output verbatim,
# no hand adjustments needed this round: the r11 deferral arithmetic
# (recorded in that round's version of this comment, git history)
# closes exactly as planned.
#   - The TWO r8-vintage deferrals lead: stream_sessionization and
#     stream_stream_time_join (newest green r8 — the only queries
#     whose driver evidence reached the 3-round age limit; r11
#     verdict: "r12 MUST grade them").
#   - The 48 remaining r9-vintage greens fill the rest (49 r9 greens
#     minus dedup_fuzzy_name_match, which re-graded at r11 after its
#     r10 semantics change). 2 + 48 = 50.
# SATURATION: at 150 registered queries, a 50-slot window, and the
# 3-round evidence-age limit, the rotation is exactly full with ZERO
# slack. Steady state from here: r13 = the 50 r10
# greens, r14 = the 50 r11 greens, r15 = the 50 r12 greens, keeping
# every query's newest green row <= 3 rounds old with zero slack. Any
# NEW registration (or same-round re-grade after a semantics change)
# needs a slot freed by RETIRING a query first — the policy is now
# mechanical: scripts/plan_rotation.py (r11 verdict task #6).
#
# corpus_ngram_novelty and the two span queries carry the r12
# skew-proof rewrite — PLAN-only changes (bit-identical output,
# verified against the oracle in-round), so no same-round re-grade is
# required; novelty happens to re-grade here anyway by age.
_PRIORITY: tuple[str, ...] = (
    "stream_sessionization",  # r8 green - evidence at 3-round age limit
    "stream_stream_time_join",  # r8 green - evidence at 3-round age limit
    "scan_filter_project",  # r9 green
    "filter_in",  # r9 green
    "ts_cusum_drift",  # r9 green
    "event_path_topk",  # r9 green
    "conditional_cast",  # r9 green
    "array_higher_order",  # r9 green
    "try_cast_predicates",  # r9 green
    "sha256_hash",  # r9 green
    "map_functions",  # r9 green
    "iot_password_hash",  # r9 green
    "unit_convert_bulk",  # r9 green
    "cagg_incremental_refresh",  # r9 green
    "ts_range_join",  # r9 green
    "ts_ewma_smooth",  # r9 green
    "ts_anomaly_mad",  # r9 green
    "ts_threshold_alerts",  # r9 green
    "chain_verify",  # r9 green
    "vector_l2_radius",  # r9 green
    "vector_filtered_topk",  # r9 green
    "vector_multi_query_topk",  # r9 green
    "dedup_minhash_lsh",  # r9 green
    "dedup_ngram_jaccard",  # r9 green
    "dedup_ngram_jaccard_capped",  # r9 green
    "dedup_cluster_assign",  # r9 green
    "dedup_repeated_ngrams",  # r9 green
    "dedup_ngram_containment",  # r9 green
    "corpus_ngram_novelty",  # r9 green - r12 skew-proof plan, same hash
    "text_chunk_windows",  # r9 green
    "corpus_train_val_test_split",  # r9 green
    "text_strip_html",  # r9 green
    "text_bpe_token_count_fixed",  # r9 green
    "text_ngram_lm_score",  # r9 green
    "text_trigram_lm_score",  # r9 green
    "corpus_ccnet_buckets",  # r9 green
    "corpus_mixture_sample",  # r9 green
    "heavy_hitter_ngrams",  # r9 green
    "ann_lsh_cosine",  # r9 green
    "text_quality_classifier",  # r9 green
    "zorder_key_events",  # r9 green
    "text_trigram_coverage",  # r9 green
    "stream_rollup_to_table",  # r9 green
    "stream_exact_dedup",  # r9 green
    "stream_threshold_alerts",  # r9 green
    "timetravel_asof_digest",  # r9 green
    "evolution_nullfill_digest",  # r9 green
    "txn_atomicity_digest",  # r9 green
    "fk_cascade_digest",  # r9 green
    "continuous_slot14_digest",  # r9 green
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
