"""Full-text keyword search: BM25 scoring, ranked retrieval, and
reciprocal-rank-fusion hybrid search (keyword + vector).

The reference ships vector-only retrieval (Iot.Database/IotVectorDb.cs);
a training-data / RAG pipeline also needs lexical search over the
document corpus. Spark-first design:

- Term frequencies come from ONE explode + keyed groupBy on
  (doc_id, term) — map-side combine applies, and the explode happens
  AFTER the query-term filter candidates are identified per row with
  `array_intersect`, so non-matching documents contribute zero exploded
  rows (at 100 TB the token stream never materializes for the ~all
  documents that match no query term).
- Corpus statistics (N, total token count) are a single global aggregate
  broadcast as one row; per-term document frequencies are a tiny frame
  broadcast-joined on term. Neither shuffles the corpus.
- The final top-k compiles to TakeOrderedAndProject (per-partition
  heap + k-row merge) — no full sort at any scale.

Cross-engine determinism (the driver hashes values): per-(doc, term)
BM25 partial scores are computed with an IDENTICAL IEEE operation
sequence in Spark and the DuckDB oracle, floor-scaled to integer
micro-units, and only THEN summed per document — integer sums are
partial-order-independent, double sums are not. The only transcendental
is LN over ~|vocabulary| distinct inputs, where JVM and libm agree to
the last bit for all tested inputs (and a last-ulp flip would shift a
micro-unit boundary with probability ~1e-7 per term).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def bm25_scores(
    df: DataFrame,
    terms: Sequence[str],
    content: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Per-document BM25 scores for a bag of query terms.

    Returns (id_col, n_terms_matched, score_micro) for every document
    matching at least one term; score_micro is the sum of per-term
    partial scores floor-scaled to 1e-6 units (bigint).
    """
    toks = F.split(F.col(content), " ")
    base = df.select(
        F.col(id_col).alias("id"),
        F.size(toks).alias("dl"),
        toks.alias("ws"),
    )
    # Global corpus stats: one row, broadcast. At cluster scale this is a
    # partial-aggregated scan, not a shuffle of the corpus.
    stats = base.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    term_arr = F.array(*[F.lit(t) for t in terms])
    tf = (
        base.withColumn("hit", F.array_intersect("ws", term_arr))
        .filter(F.size("hit") > 0)
        .select(
            "id",
            "dl",
            F.explode(
                F.filter("ws", lambda w: F.array_contains(term_arr, w))
            ).alias("term"),
        )
        .groupBy("id", "term")
        .agg(F.count("*").alias("tf"), F.first("dl").alias("dl"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))

    scored = tf.join(F.broadcast(dfreq), "term").crossJoin(F.broadcast(stats))
    # IEEE operation order mirrored EXACTLY by the DuckDB oracle SQL:
    #   idf   = LN((n_docs - df + 0.5) / (df + 0.5) + 1.0)
    #   dlnrm = b * dl * n_docs / sum_dl          (left-assoc)
    #   den   = tf + k1 * ((1 - b) + dlnrm)
    #   part  = idf * (tf * (k1 + 1)) / den       (left-assoc)
    n_d = F.col("n_docs").cast("double")
    df_d = F.col("df").cast("double")
    tf_d = F.col("tf").cast("double")
    dl_d = F.col("dl").cast("double")
    idf = F.log((n_d - df_d + F.lit(0.5)) / (df_d + F.lit(0.5)) + F.lit(1.0))
    dlnrm = F.lit(b) * dl_d * n_d / F.col("sum_dl").cast("double")
    den = tf_d + F.lit(k1) * (F.lit(1.0 - b) + dlnrm)
    part = idf * (tf_d * F.lit(k1 + 1.0)) / den
    per_term = scored.select(
        "id",
        F.floor(part * F.lit(1000000.0)).cast("bigint").alias("part_micro"),
    )
    return per_term.groupBy("id").agg(
        F.count("*").alias("n_terms_matched"),
        F.sum("part_micro").alias("score_micro"),
    )


def bm25_oracle_sql(
    terms: Sequence[str],
    table: str = "documents",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB CTE mirroring bm25_scores bit-for-bit: exposes `bm`
    (id, n_terms_matched, score_micro)."""
    quoted = ", ".join(f"'{t}'" for t in terms)
    return f"""
    base AS (
        SELECT CAST({id_col} AS BIGINT) AS id,
               len(string_split(text, ' ')) AS dl,
               string_split(text, ' ') AS ws
        FROM {table}
    ),
    stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM base),
    tf AS (
        SELECT id, term, COUNT(*) AS tf, FIRST(dl) AS dl
        FROM (SELECT id, dl, unnest(ws) AS term FROM base)
        WHERE term IN ({quoted})
        GROUP BY id, term
    ),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    per_term AS (
        SELECT tf.id,
               CAST(FLOOR(
                   LN((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                      / (CAST(df AS DOUBLE) + 0.5) + 1.0)
                   * (CAST(tf AS DOUBLE) * {k1 + 1.0!r})
                   / (CAST(tf AS DOUBLE) + {k1!r}
                      * ({1.0 - b!r} + {b!r} * CAST(dl AS DOUBLE)
                         * CAST(n_docs AS DOUBLE) / CAST(sum_dl AS DOUBLE)))
                   * 1000000.0) AS BIGINT) AS part_micro
        FROM tf JOIN dfreq USING (term) CROSS JOIN stats
    ),
    bm AS (
        -- DuckDB SUM(BIGINT) yields HUGEINT (surfaces as double); pin to
        -- BIGINT so the value-hash matches Spark's bigint sum
        SELECT id, COUNT(*) AS n_terms_matched,
               CAST(SUM(part_micro) AS BIGINT) AS score_micro
        FROM per_term GROUP BY id
    )
    """


def bm25_topk(
    df: DataFrame,
    terms: Sequence[str],
    k: int = 20,
    content: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents by BM25 (score desc, id asc tie-break) —
    compiles to TakeOrderedAndProject."""
    bm = bm25_scores(df, terms, content=content, id_col=id_col, k1=k1, b=b)
    return (
        bm.orderBy(F.col("score_micro").desc(), F.col("id"))
        .limit(k)
        .select(
            F.col("id").alias(id_col), "n_terms_matched", "score_micro"
        )
    )


def ranked(df: DataFrame, order: list[Column], k: int) -> DataFrame:
    """Top-k rows by `order` with a 1-based dense rank column `r`.

    Takes the k rows FIRST (TakeOrderedAndProject — distributed heap),
    then ranks the k survivors in a single tiny partition; the global
    window never sees more than k rows at any corpus size.
    """
    top = df.orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    return top.withColumn("r", F.row_number().over(w))


def rrf_fuse(
    a: DataFrame,
    b: DataFrame,
    on: str,
    rrf_k: int = 60,
    miss_rank: int = 1000,
) -> DataFrame:
    """Reciprocal-rank fusion of two ranked lists (columns: `on`, `r`).

    rrf = 1/(rrf_k + r_a) + 1/(rrf_k + r_b), with miss_rank for ids
    absent from one list. Both addends are exact IEEE divisions of small
    integers and the addition order is fixed — bit-identical across
    engines with no scaling needed.
    """
    fa = a.select(F.col(on), F.col("r").alias("r_a"))
    fb = b.select(F.col(on), F.col("r").alias("r_b"))
    joined = fa.join(fb, on, "full_outer").select(
        F.col(on),
        F.coalesce("r_a", F.lit(miss_rank)).alias("r_a"),
        F.coalesce("r_b", F.lit(miss_rank)).alias("r_b"),
    )
    rrf = (
        F.lit(1.0) / (F.lit(rrf_k) + F.col("r_a")).cast("double")
    ) + (F.lit(1.0) / (F.lit(rrf_k) + F.col("r_b")).cast("double"))
    return joined.withColumn("rrf_score", rrf)
