"""Vector similarity search (reference: Iot.Database/IotVectorDb.cs).

Reference surface:
- SearchCosSimilarityAsync (:244-316): brute-force cosine vs all rows,
  score >= minRelevanceScore (default 0.55), top `limit` (default 150),
  embeddings stripped from results.
- SearchFaissTopKAsync (:151-190): L2 top-k (FAISS flat — i.e. exact
  brute force over everything).
- SearchFaissRadiusAsync (:192-235): L2 distance <= radius.
- InsertUpdateQueue/ProcessQueueAsync (:39-149): per-guid dedup (latest
  wins) before upsert.

Spark-first design: distances are built-in higher-order-function
expressions over array<float> columns — JVM-side, codegen'd, no Python.
Exact determinism across engines: element products are summed by an
ORDERED left fold (F.aggregate walks the array sequentially; DuckDB's
list_reduce folds the same way), so both engines perform the identical
sequence of IEEE double additions and produce bit-identical results.
(A plain SUM over unnested elements would not — aggregation order is
engine-dependent.)

Scale path: brute-force is embarrassingly parallel (scan + local top-k +
global top-k merge: Spark's TakeOrderedAndProject). For 100 TB an IVF
variant lives in operators/similarity.py (bucket by nearest centroid,
search only the probed buckets).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

def _seq_sum(products: Column) -> Column:
    """Ordered left-fold sum in double: ((0+p1)+p2)+... — deterministic
    and reproducible by DuckDB's list_reduce for oracle checks."""
    return F.aggregate(products, F.lit(0.0), lambda acc, v: acc + v)


def dot(a: Column, b: Column) -> Column:
    return _seq_sum(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    )


def norm_sq(a: Column) -> Column:
    return _seq_sum(
        F.transform(a, lambda x: x.cast("double") * x.cast("double"))
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """dot / (|a| * |b|)  (IotVectorDb.ComputeCosineSimilarity)."""
    return dot(a, b) / (F.sqrt(norm_sq(a)) * F.sqrt(norm_sq(b)))


def l2_distance_sq(a: Column, b: Column) -> Column:
    return _seq_sum(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        )
    )


def search_cosine(
    items: DataFrame,
    query_vec: Column,
    embedding: str = "embedding",
    min_score: float = 0.55,
    limit: int = 150,
    id_col: str = "vec_id",
) -> DataFrame:
    """Brute-force cosine top-k (IotVectorDb.cs:244-316). Results exclude
    the embedding column, like the reference strips embeddings."""
    scored = items.withColumn(
        "relevance", cosine_similarity(F.col(embedding), query_vec)
    )
    return (
        scored.filter(F.col("relevance") >= min_score)
        .orderBy(F.col("relevance").desc(), F.col(id_col))
        .limit(limit)
        .drop(embedding)
    )


def search_l2_topk(
    items: DataFrame,
    query_vec: Column,
    k: int,
    embedding: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact L2 top-k (IotVectorDb.cs:151-190). Spark compiles the
    orderBy+limit to TakeOrderedAndProject: per-partition local top-k,
    then a k-row merge on the driver — no full sort, no full shuffle."""
    scored = items.withColumn(
        "distance_sq", l2_distance_sq(F.col(embedding), query_vec)
    )
    return (
        scored.orderBy(F.col("distance_sq").asc(), F.col(id_col))
        .limit(k)
        .drop(embedding)
    )


def search_l2_radius(
    items: DataFrame,
    query_vec: Column,
    radius: float,
    embedding: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """L2 radius filter (IotVectorDb.cs:192-235) — distance <= radius."""
    scored = items.withColumn(
        "distance_sq", l2_distance_sq(F.col(embedding), query_vec)
    )
    return scored.filter(F.col("distance_sq") <= radius * radius).drop(embedding)


def upsert_dedup(
    queue: DataFrame, guid: str = "guid", ts: str = "ts"
) -> DataFrame:
    """Per-guid latest-wins dedup of the embedding upsert queue
    (IotVectorDb.InsertUpdateQueue :39-66) — the foreachBatch pre-merge
    step: row_number over (guid order by ts desc) = 1."""
    from pyspark.sql import Window as W

    w = W.partitionBy(guid).orderBy(F.col(ts).desc())
    return (
        queue.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
