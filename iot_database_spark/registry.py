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
# Round-9 window (exactly 50 slots) — `python scripts/plan_rotation.py
# --slots 50` output with two hand adjustments: (a) the EIGHT never-graded
# round-9 additions lead (continuous_slot14_digest, vector_filtered_topk,
# vector_multi_query_topk, dedup_ngram_containment, corpus_ngram_novelty,
# event_path_topk, decontaminate_eval_leak_report, ts_cusum_drift), and (b) the three LM-family queries whose SEMANTICS
# changed this round (min_count=2 model pruning — output values differ
# from their r8-graded form) are pulled forward for immediate re-grading
# even though their r8 rows are the newest greens. Then the 38 r6-vintage
# greens whose evidence ages out next, then the four oldest r7 greens;
# the other eight r7 greens (sort_limit_offset, take_last,
# multi_key_sort, q01_pricing_summary, global_agg, groupby_having,
# distinct_op, count_exists_minmax) wait for r10 — all r7 evidence is 2
# rounds old at r9, inside the 3-window limit (150 slots over r9-r11
# still cover the 143 registered queries). dedup_ngram_jaccard_absolute was
# RETIRED from the registry this round (r8 verdict #6 — the
# known-quadratic compat variant; library function + local parity test
# remain, see COVERAGE.md "Driver-evidence policy").
_PRIORITY: tuple[str, ...] = (
    "continuous_slot14_digest",  # never graded
    "vector_filtered_topk",  # never graded (new r9: pre-filter pushdown ANN)
    "vector_multi_query_topk",  # never graded (new r9: batched one-scan search)
    "dedup_ngram_containment",  # never graded (new r9: asymmetric containment)
    "corpus_ngram_novelty",  # never graded (new r9: first-occurrence novelty)
    "event_path_topk",  # never graded (new r9: top-k session paths)
    "decontaminate_eval_leak_report",  # never graded (new r9: eval-side view)
    "ts_cusum_drift",  # never graded (new r9: windowed CUSUM change detection)
    "text_ngram_lm_score",  # r8 green, SEMANTICS CHANGED r9 (min_count pruning) - must re-grade
    "text_trigram_lm_score",  # r8 green, SEMANTICS CHANGED r9 - must re-grade
    "corpus_ccnet_buckets",  # r8 green, SEMANTICS CHANGED r9 - must re-grade
    "conditional_cast",  # r6 green
    "array_higher_order",  # r6 green
    "try_cast_predicates",  # r6 green
    "sha256_hash",  # r6 green
    "map_functions",  # r6 green
    "iot_password_hash",  # r6 green
    "unit_convert_bulk",  # r6 green
    "cagg_incremental_refresh",  # r6 green
    "ts_range_join",  # r6 green
    "ts_ewma_smooth",  # r6 green
    "ts_anomaly_mad",  # r6 green
    "ts_threshold_alerts",  # r6 green
    "chain_verify",  # r6 green
    "vector_l2_radius",  # r6 green
    "dedup_minhash_lsh",  # r6 green
    "dedup_ngram_jaccard",  # r6 green
    "dedup_ngram_jaccard_capped",  # r6 green
    "dedup_cluster_assign",  # r6 green
    "dedup_repeated_ngrams",  # r6 green
    "dedup_fuzzy_name_match",  # r6 green
    "text_chunk_windows",  # r6 green
    "corpus_train_val_test_split",  # r6 green
    "text_strip_html",  # r6 green
    "text_bpe_token_count_fixed",  # r6 green
    "corpus_mixture_sample",  # r6 green
    "heavy_hitter_ngrams",  # r6 green
    "ann_lsh_cosine",  # r6 green
    "text_quality_classifier",  # r6 green
    "zorder_key_events",  # r6 green
    "text_trigram_coverage",  # r6 green
    "stream_rollup_to_table",  # r6 green
    "stream_exact_dedup",  # r6 green
    "stream_threshold_alerts",  # r6 green
    "timetravel_asof_digest",  # r6 green
    "evolution_nullfill_digest",  # r6 green
    "txn_atomicity_digest",  # r6 green
    "fk_cascade_digest",  # r6 green
    "scan_filter_project",  # r7 green
    "filter_in",  # r7 green
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
