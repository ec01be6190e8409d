"""Oracle-checked full-text and hybrid search queries (operators/search.py).

BM25 ranked retrieval over the documents table and reciprocal-rank
fusion with brute-force cosine retrieval over the aligned embeddings
table (vec_id == doc_id in the synthetic corpus) — the lexical +
semantic hybrid a RAG / training-data pipeline runs. The reference
covers only the vector leg (Iot.Database/IotVectorDb.cs:244-263); BM25
and the fusion are superset capabilities.

Determinism: BM25 partial scores are floor-scaled to int64 micro-units
before the per-document sum (integer sums are partial-order-
independent); RRF scores are sums of two exact small-integer reciprocals
in a fixed order. See operators/search.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iot_database_spark.operators import search as se
from iot_database_spark.operators import vector as vec
from iot_database_spark.operators.vector_queries import _duck_cos
from iot_database_spark.registry import load_views, register

# 'dup' is rare (planted duplicate marker); 'spark'/'vector' are common —
# the df spread exercises the idf curve.
_TERMS = ("dup", "spark", "vector")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    tables = load_views(spark, sf_dir)
    return tables["documents"].select(
        F.col("doc_id").cast("bigint").alias("doc_id"), "text"
    )


_BM25_ORACLE = (
    "WITH " + se.bm25_oracle_sql(_TERMS) + """
    SELECT id AS doc_id, n_terms_matched, score_micro
    FROM bm
    ORDER BY score_micro DESC, id
    LIMIT 20
    """
)


@register("search_bm25_topk", oracle=_BM25_ORACLE)
def search_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 for a 3-term keyword query. One keyed (doc, term)
    exchange over only term-matching documents; corpus stats + per-term
    document frequencies broadcast; top-k via TakeOrderedAndProject."""
    return se.bm25_topk(_docs(spark, sf_dir), _TERMS, k=20)


_HYBRID_ORACLE = (
    "WITH " + se.bm25_oracle_sql(_TERMS) + f""",
    bmr AS (
        SELECT id AS doc_id,
               ROW_NUMBER() OVER (ORDER BY score_micro DESC, id) AS r
        FROM bm
        QUALIFY r <= 100
    ),
    q AS (
        SELECT embedding AS qv FROM embeddings
        WHERE CAST(vec_id AS BIGINT) = 0
    ),
    cosr AS (
        SELECT vec_id AS doc_id,
               ROW_NUMBER() OVER (ORDER BY rel DESC, vec_id) AS r
        FROM (
            SELECT CAST(e.vec_id AS BIGINT) AS vec_id,
                   {_duck_cos('e.embedding', 'q.qv')} AS rel
            FROM embeddings e, q
        )
        QUALIFY r <= 100
    ),
    fused AS (
        SELECT COALESCE(b.doc_id, c.doc_id) AS doc_id,
               COALESCE(b.r, 1000) AS r_bm25,
               COALESCE(c.r, 1000) AS r_vec
        FROM bmr b FULL OUTER JOIN cosr c ON b.doc_id = c.doc_id
    )
    SELECT doc_id, r_bm25, r_vec,
           (1.0 / (60 + r_bm25)) + (1.0 / (60 + r_vec)) AS rrf_score
    FROM fused
    ORDER BY rrf_score DESC, doc_id
    LIMIT 20
    """
)


@register("search_hybrid_rrf", oracle=_HYBRID_ORACLE)
def search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 top-100 + cosine top-100 fused by
    reciprocal rank (k=60), top-20. Each leg takes its k rows with a
    distributed heap FIRST; the rank window and the fusion join only
    ever see <= 100 rows per leg regardless of corpus size."""
    docs = _docs(spark, sf_dir)
    bm = se.ranked(
        se.bm25_scores(docs, _TERMS),
        [F.col("score_micro").desc(), F.col("id")],
        k=100,
    )
    tables = load_views(spark, sf_dir)
    emb = tables["embeddings"].select(
        F.col("vec_id").cast("bigint").alias("vec_id"), "embedding"
    )
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    scored = emb.crossJoin(F.broadcast(q)).select(
        F.col("vec_id").alias("id"),
        vec.cosine_similarity(F.col("embedding"), F.col("qv")).alias("rel"),
    )
    cos = se.ranked(scored, [F.col("rel").desc(), F.col("id")], k=100)
    fused = se.rrf_fuse(bm, cos, on="id")
    return (
        fused.orderBy(F.col("rrf_score").desc(), F.col("id"))
        .limit(20)
        .select(
            F.col("id").alias("doc_id"),
            F.col("r_a").alias("r_bm25"),
            F.col("r_b").alias("r_vec"),
            "rrf_score",
        )
    )


# Exact PHRASE search — positional matching, the query class BM25's
# bag-of-words scoring cannot express (reference parity: LiteDB's
# LIKE '%a b c%' scan; here word-boundary-exact and rankable).
PHRASE = "hash join"
PHRASE_LEN = 2
PHRASE_TOPK = 10

_PHRASE_TOPK_ORACLE = f"""
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


@register("search_phrase_topk", oracle=_PHRASE_TOPK_ORACLE)
def search_phrase_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k documents by EXACT phrase occurrence count (word-boundary
    n-gram equality, not substring LIKE — 'hash join' must not match
    'rehash joint'). Counting is NARROW per-row work (filter over the
    shingle array — the positional-index answer without materializing
    positions); the only movement is the TakeOrderedAndProject top-k
    with a doc_id tie-break, so the plan is scan -> project -> filter
    -> top-k at any corpus size. The phrase and k are module constants
    for the graded shape; the library form is this function body with
    them as parameters. Registered r11; parity-tested since r10
    (staged in operators/staged_r11.py, now here)."""
    from iot_database_spark.operators import dedup as dd
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
