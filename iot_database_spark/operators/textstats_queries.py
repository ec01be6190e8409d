"""Oracle-checked text-analysis queries over the documents table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iot_database_spark.operators import textstats as tx
from iot_database_spark.operators.hashing import duck_hash64
from iot_database_spark.registry import load_views, register


@register(
    "text_quality_scores",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(LENGTH(text) AS INT) AS n_chars_computed,
           CAST(LEN(string_split(text, ' ')) AS INT) AS n_tokens,
           CAST(LEN(regexp_extract_all(text, '[a-z0-9]+')) AS INT) AS n_word_tokens,
           list_reduce(list_prepend(0, list_transform(string_split(text, ' '),
               w -> CAST(LENGTH(w) AS INT))), (acc, x) -> acc + x)
             / CAST(GREATEST(LEN(string_split(text, ' ')), 1) AS DOUBLE)
             AS mean_token_len,
           CAST(LEN(list_distinct(string_split(text, ' '))) AS INT)
             / CAST(GREATEST(LEN(string_split(text, ' ')), 1) AS DOUBLE)
             AS uniqueness,
           CAST(LEN(list_filter(string_split(text, ' '),
               w -> list_contains(['the','a','of','and','to','in','is'], LOWER(w)))) AS INT)
             / CAST(GREATEST(LEN(string_split(text, ' ')), 1) AS DOUBLE)
             AS stopword_ratio_en
    FROM documents
    """,
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-curation quality features: char/token counts, mean token
    length, uniqueness, stopword ratio."""
    tables = load_views(spark, sf_dir)
    docs = tables["documents"].select(
        F.col("doc_id").cast("bigint").alias("doc_id"), "text"
    )
    return tx.quality_scores(docs).drop("text")


@register(
    "text_token_count",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(LEN(string_split(text, ' ')) AS INT) AS ws_tokens,
           CAST(LEN(regexp_extract_all(text, '[a-z0-9]+')) AS INT) AS word_tokens,
           CAST(CEIL(LENGTH(text) / 4.0) AS BIGINT) AS byte_len_est_tokens
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: whitespace, word-regex, and the
    chars/4 LLM heuristic."""
    tables = load_views(spark, sf_dir)
    docs = tables["documents"]
    return docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        tx.token_count(F.col("text")).alias("ws_tokens"),
        tx.word_regex_count(F.col("text")).alias("word_tokens"),
        F.ceil(F.length("text") / 4.0).cast("bigint").alias("byte_len_est_tokens"),
    )


@register(
    "text_langid",
    oracle="""
    WITH scored AS (
        SELECT CAST(doc_id AS BIGINT) AS doc_id, lang AS labeled_lang,
               LEN(list_filter(string_split(LOWER(text), ' '),
                   w -> list_contains(['der','die','das','und','ist','ein','zu'], w))) AS s_de,
               LEN(list_filter(string_split(LOWER(text), ' '),
                   w -> list_contains(['the','a','of','and','to','in','is'], w))) AS s_en,
               LEN(list_filter(string_split(LOWER(text), ' '),
                   w -> list_contains(['el','la','de','y','que','en','un'], w))) AS s_es,
               LEN(list_filter(string_split(LOWER(text), ' '),
                   w -> list_contains(['le','la','de','et','un','que','pour'], w))) AS s_fr
        FROM documents
    )
    SELECT doc_id, labeled_lang,
           CASE
             WHEN GREATEST(s_de, s_en, s_es, s_fr) = 0 THEN 'unknown'
             WHEN s_de = GREATEST(s_de, s_en, s_es, s_fr) THEN 'de'
             WHEN s_en = GREATEST(s_de, s_en, s_es, s_fr) THEN 'en'
             WHEN s_es = GREATEST(s_de, s_en, s_es, s_fr) THEN 'es'
             ELSE 'fr'
           END AS detected_lang
    FROM scored
    """,
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language ID vs the labeled lang column (the
    heuristic is deterministic; plug fastText via pandas_udf for real)."""
    tables = load_views(spark, sf_dir)
    docs = tables["documents"]
    return docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("lang").alias("labeled_lang"),
        tx.detect_language(F.col("text")).alias("detected_lang"),
    )


# mirrors the HOF formulation: per-row shingle hashes -> sliding-window
# minima -> distinct -> count/min/xor-fold. No unnest, no window.
_FP_ORACLE = f"""
    WITH hashed AS (
        SELECT CAST(doc_id AS BIGINT) AS id,
               list_transform(
                   list_transform(range(1, len(string_split(text, ' ')) - 1),
                       i -> string_split(text, ' ')[i] || ' ' ||
                            string_split(text, ' ')[i+1] || ' ' ||
                            string_split(text, ' ')[i+2]),
                   s -> {duck_hash64('s')}) AS hs
        FROM documents
        WHERE len(string_split(text, ' ')) >= 3
    ),
    fps AS (
        SELECT id,
               list_distinct(list_transform(range(5, len(hs) + 1),
                   i -> list_min(hs[i-4:i]))) AS f
        FROM hashed
    )
    SELECT id,
           CAST(len(f) AS BIGINT) AS n_fingerprints,
           list_min(f) AS min_fingerprint,
           list_reduce(list_prepend(CAST(0 AS BIGINT), f),
                       (a, x) -> xor(a, x)) AS fingerprint_xor
    FROM fps
    WHERE len(f) > 0
"""


@register("text_fingerprint", oracle=_FP_ORACLE)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints: 5-wide sliding min over shingle hashes,
    distinct minima per doc."""
    tables = load_views(spark, sf_dir)
    docs = (
        tables["documents"]
        .select(F.col("doc_id").cast("bigint").alias("doc_id"), "text")
        .filter(F.size(F.split("text", " ")) >= 3)
        # single-file parquet -> 1 split; spread the hash work first
        .repartition(spark.sparkContext.defaultParallelism)
    )
    return tx.fingerprint(docs)
