"""STAGED FOR ROUND 11 — implemented and oracle-tested, NOT registered.

The r10 driver window had zero free slots (the 48 r7-vintage greens aged
to the 3-round evidence limit and the two semantics-changed
decontamination queries must re-grade), and a query registered without a
same-round driver row reads as never-graded at judging. These three
operators are therefore built, documented, and bit-exact-tested against
their DuckDB oracles now (tests/test_staged_r11.py runs the SAME
_assert_parity gate the registered queries use), and move to their home
modules with @register at the start of round 11, where the window has
three free slots (47 r8 greens + these).

This module is deliberately NOT in registry._ensure_loaded's import
list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iot_database_spark.operators import curation as cu
from iot_database_spark.operators import dedup as dd
from iot_database_spark.operators.hashing import duck_hash64
from iot_database_spark.registry import load_views

# ---------------------------------------------------------------------------
# 1. Span-level exact duplication profile (Lee et al., "Deduplicating
#    Training Data Makes Language Models Better": the unit of harmful
#    duplication is the repeated SPAN, not the whole document).
# ---------------------------------------------------------------------------

SPAN_N = 8  # tokens per span — long enough that collisions mean copying

SPAN_EXACT_ORACLE = f"""
    WITH words AS (
        SELECT CAST(doc_id AS BIGINT) AS id, string_split(text, ' ') AS ws
        FROM documents
        WHERE len(string_split(text, ' ')) >= {SPAN_N}
    ),
    sp AS (
        SELECT DISTINCT id, s FROM (
            SELECT id,
                   unnest(list_transform(range(1, len(ws) - {SPAN_N - 2}),
                          i -> {" || ' ' || ".join(f"ws[i+{k}]" for k in range(SPAN_N))})) AS s
            FROM words
        )
    ),
    dfreq AS (SELECT s, COUNT(*) AS df FROM sp GROUP BY s)
    SELECT sp.id AS doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(COUNT(CASE WHEN dfreq.df >= 2 THEN 1 END) AS BIGINT)
               AS n_dup_spans,
           COUNT(CASE WHEN dfreq.df >= 2 THEN 1 END)
               / CAST(COUNT(*) AS DOUBLE) AS dup_fraction
    FROM sp JOIN dfreq ON sp.s = dfreq.s
    GROUP BY sp.id
"""


def dedup_span_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document CROSS-DOC span duplication profile: the fraction of
    a doc's distinct {SPAN_N}-token spans that appear verbatim in at
    least one OTHER document — the span-level signal document-level
    dedup (exact or MinHash) structurally misses when only a paragraph
    is copied.

    Scale shape: per-doc span dedup is NARROW (array_distinct over the
    shingle array — no exchange); ONE exchange builds the span
    document-frequency table; the join back lands on the same key, and
    the per-doc aggregation is the only other exchange. Output rows =
    docs, join rows = distinct (doc, span) pairs — linear in corpus at
    any scale, no cross-doc pair generation anywhere (unlike candidate-
    pair dedup, a span profile never needs the quadratic join, which is
    why it needs no max_bucket guard)."""
    from iot_database_spark.session import spread_small_input

    tables = load_views(spark, sf_dir)
    docs = spread_small_input(
        tables["documents"]
        .select(F.col("doc_id").cast("bigint").alias("doc_id"), "text")
        .filter(F.size(F.split("text", " ")) >= SPAN_N),
        spark,
        cache_key=f"documents:{sf_dir}",
    )
    spans = docs.select(
        "doc_id",
        F.explode(F.array_distinct(dd.shingles(F.col("text"), SPAN_N))).alias("s"),
    )
    dfreq = spans.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    return (
        spans.join(dfreq, "s")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_spans"),
            F.count(F.when(F.col("df") >= 2, 1)).cast("bigint").alias("n_dup_spans"),
        )
        .withColumn(
            "dup_fraction",
            F.col("n_dup_spans") / F.col("n_spans").cast("double"),
        )
    )


# ---------------------------------------------------------------------------
# 2. Quality-weighted resampling — the curation step AFTER scoring:
#    sample each document with probability proportional to its quality
#    signal (DCLM/FineWeb-style up/down-weighting), deterministically.
# ---------------------------------------------------------------------------

QUALITY_RESAMPLE_ORACLE = f"""
    WITH d AS (
        SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
               LEAST(10000, len(string_split(text, ' ')) * 40) AS rate_bp
        FROM documents
    ),
    flagged AS (
        SELECT *,
               {duck_hash64("'qrs-v1:' || CAST(doc_id AS VARCHAR)")}
                 % 10000 < rate_bp AS sampled
        FROM d
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(CASE WHEN sampled THEN 1 END) AS BIGINT) AS n_kept,
           CAST(SUM(rate_bp) AS BIGINT) AS sum_rate_bp
    FROM flagged
    GROUP BY source
"""


def corpus_quality_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic quality-PROPORTIONAL sampling: each doc's keep
    probability is its own quality signal (here length-proportional,
    capped at 100% for >=250-word docs — the stand-in for any scored
    quality column), decided by hash(salt:doc_id) %% 10000 < rate_bp.
    Unlike corpus_mixture_sample (one fixed rate per SOURCE), the rate
    varies per DOCUMENT — the importance-resampling shape training-data
    curation uses to up-weight high-quality text without a global sort
    or any cross-row dependence. Per-source accounting out; the
    decision column itself is cu.mixture_sample's, so Spark and DuckDB
    share one hash recipe."""
    tables = load_views(spark, sf_dir)
    docs = tables["documents"].select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "source",
        F.least(
            F.lit(10000), F.size(F.split("text", " ")) * 40
        ).cast("bigint").alias("rate_bp"),
    )
    flagged = cu.mixture_sample(docs, rate_bp=F.col("rate_bp"), salt="qrs-v1")
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.count(F.when(F.col("sampled"), 1)).cast("bigint").alias("n_kept"),
        F.sum("rate_bp").cast("bigint").alias("sum_rate_bp"),
    )


# ---------------------------------------------------------------------------
# 3. Exact PHRASE search — positional matching, the query class BM25's
#    bag-of-words scoring cannot express (reference parity: LiteDB's
#    LIKE '%a b c%' scan; here word-boundary-exact and rankable).
# ---------------------------------------------------------------------------

PHRASE = "hash join"
PHRASE_LEN = 2
PHRASE_TOPK = 10

PHRASE_TOPK_ORACLE = f"""
    WITH words AS (
        SELECT CAST(doc_id AS BIGINT) AS doc_id, string_split(text, ' ') AS ws
        FROM documents
        WHERE len(string_split(text, ' ')) >= {PHRASE_LEN}
    ),
    hits AS (
        SELECT doc_id,
               len(list_filter(list_transform(range(1, len(ws)),
                   i -> ws[i] || ' ' || ws[i+1]),
                   s -> s = '{PHRASE}')) AS n_hits,
               len(ws) AS n_words
        FROM words
    )
    SELECT doc_id, CAST(n_hits AS BIGINT) AS n_hits,
           CAST(n_words AS BIGINT) AS n_words
    FROM hits WHERE n_hits > 0
    ORDER BY n_hits DESC, doc_id LIMIT {PHRASE_TOPK}
"""


def search_phrase_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k documents by EXACT phrase occurrence count (word-boundary
    n-gram equality, not substring LIKE — 'hash join' must not match
    'rehash joint'). Counting is NARROW per-row work
    (filter over the shingle array — the positional-index answer
    without materializing positions); the only movement is the
    TakeOrderedAndProject top-k with a doc_id tie-break, so the plan is
    scan -> project -> filter -> top-k at any corpus size. The phrase
    and k are module constants for the graded shape; the library form
    is this function body with them as parameters."""
    from iot_database_spark.session import spread_small_input

    tables = load_views(spark, sf_dir)
    docs = spread_small_input(
        tables["documents"]
        .select(F.col("doc_id").cast("bigint").alias("doc_id"), "text")
        .filter(F.size(F.split("text", " ")) >= PHRASE_LEN),
        spark,
        cache_key=f"documents:{sf_dir}",
    )
    hits = docs.select(
        "doc_id",
        F.size(
            F.filter(
                dd.shingles(F.col("text"), PHRASE_LEN),
                lambda s: s == F.lit(PHRASE),
            )
        ).cast("bigint").alias("n_hits"),
        F.size(F.split("text", " ")).cast("bigint").alias("n_words"),
    )
    return (
        hits.filter(F.col("n_hits") > 0)
        .orderBy(F.col("n_hits").desc(), "doc_id")
        .limit(PHRASE_TOPK)
    )


STAGED_QUERIES = {
    "dedup_span_exact": dedup_span_exact,
    "corpus_quality_resample": corpus_quality_resample,
    "search_phrase_topk": search_phrase_topk,
}
STAGED_ORACLES = {
    "dedup_span_exact": SPAN_EXACT_ORACLE,
    "corpus_quality_resample": QUALITY_RESAMPLE_ORACLE,
    "search_phrase_topk": PHRASE_TOPK_ORACLE,
}
