"""Text analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

Not in the reference (closest surface: its string expression methods,
LiteDB/Document/Expression/Methods/String.cs); these are the standard
corpus-curation metrics, all as built-in Column expressions — one scan,
no Python, no shuffle (the fingerprint sliding window is a per-row HOF).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from iot_database_spark.operators.hashing import hash64

# Minimal stopword profiles for the n-gram/stopword language heuristic.
# Real deployments plug in fastText/CLD3 via a pandas_udf; the heuristic
# keeps the pipeline dependency-free and deterministic.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "es": ("el", "la", "de", "y", "que", "en", "un"),
    "fr": ("le", "la", "de", "et", "un", "que", "pour"),
    "de": ("der", "die", "das", "und", "ist", "ein", "zu"),
}


def tokens(text: Column) -> Column:
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text))


def word_regex_count(text: Column) -> Column:
    """BPE-ish token proxy: count of [a-z0-9]+ runs (a cheap, deterministic
    stand-in for subword tokenizers)."""
    return F.size(F.expr("regexp_extract_all(text, '[a-z0-9]+', 0)"))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    words = tokens(text)
    sw = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    hits = F.size(F.filter(words, lambda w: F.array_contains(sw, F.lower(w))))
    return hits / F.greatest(F.size(words), F.lit(1)).cast("double")


def uniqueness_ratio(text: Column) -> Column:
    words = tokens(text)
    return F.size(F.array_distinct(words)) / F.greatest(
        F.size(words), F.lit(1)
    ).cast("double")


def mean_token_len(text: Column) -> Column:
    words = tokens(text)
    total = F.aggregate(
        words, F.lit(0), lambda acc, w: acc + F.length(w)
    )
    return total / F.greatest(F.size(words), F.lit(1)).cast("double")


def quality_scores(df: DataFrame, text: str = "text") -> DataFrame:
    """Standard quality columns: lengths, token stats, uniqueness,
    stopword ratio — the filter features of corpus curation."""
    t = F.col(text)
    return df.select(
        *df.columns,
        F.length(t).alias("n_chars_computed"),
        token_count(t).alias("n_tokens"),
        word_regex_count(t).alias("n_word_tokens"),
        mean_token_len(t).alias("mean_token_len"),
        uniqueness_ratio(t).alias("uniqueness"),
        stopword_ratio(t).alias("stopword_ratio_en"),
    )


def detect_language(text: Column) -> Column:
    """Stopword-profile language ID: the language with the most stopword
    hits wins; ties break alphabetically; zero hits -> 'unknown'."""
    words = F.transform(tokens(text), lambda w: F.lower(w))

    def score(sw: tuple[str, ...]) -> Column:
        sw_arr = F.array(*[F.lit(x) for x in sw])
        return F.size(F.filter(words, lambda w: F.array_contains(sw_arr, w)))

    scores = [(lang, score(sw)) for lang, sw in sorted(LANG_STOPWORDS.items())]
    best = F.greatest(*[s for _, s in scores])
    out = F.lit("unknown")
    # alphabetical-first tie-break: later (alphabetically greater)
    # candidates only replace 'unknown'
    for lang, s in reversed(scores):
        out = F.when((s == best) & (best > 0), F.lit(lang)).otherwise(out)
    return out


def fingerprint(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    window: int = 5,
    n: int = 3,
) -> DataFrame:
    """Winnowing document fingerprint: hash each n-gram shingle, slide a
    `window`-wide min over the hash sequence, keep the distinct minima.
    Output per doc: n_fingerprints, min_fingerprint, fingerprint_xor
    (an order-insensitive digest of the whole set).

    Implemented entirely with per-row higher-order functions — a pure
    scan, NO shuffle, no window exchange: scales linearly and is immune
    to shuffle contention. (Full windows only, like the reference
    formulation: the first window-1 positions don't emit.)

    Catalyst pitfall this formulation dodges: a column computed in one
    projection and referenced k times in the next gets INLINED k times
    by CollapseProject (an exchange/repartition between them does NOT
    reliably block the collapse, and HOF lambdas get no common-subexpr
    elimination) — re-evaluating the md5 chain once per window position
    made the naive split 30x slower. `_let` binds the expensive array
    to a lambda variable (evaluated once per invocation), and the final
    explode(array(struct)) puts a Generate node between the struct
    computation and the downstream filter/field-projection, which
    CollapseProject cannot cross.
    """
    from iot_database_spark.operators.dedup import shingles
    from iot_database_spark.operators.hof import let as _let

    hashed = F.transform(shingles(F.col(text), n), lambda s: hash64(s))

    def _fps(hs: Column) -> Column:
        idx = F.when(
            F.size(hs) >= window,
            F.sequence(F.lit(window), F.size(hs)),
        ).otherwise(F.array().cast("array<int>"))
        return F.array_distinct(
            F.transform(
                idx,
                lambda i: F.array_min(F.slice(hs, i - (window - 1), window)),
            )
        )

    stats = _let(
        hashed,
        lambda hs: _let(
            _fps(hs),
            lambda f: F.struct(
                F.size(f).cast("bigint").alias("n_fingerprints"),
                F.array_min(f).alias("min_fingerprint"),
                F.aggregate(
                    f, F.lit(0).cast("bigint"), lambda a, x: a.bitwiseXOR(x)
                ).alias("fingerprint_xor"),
            ),
        ),
    )
    gen = df.select(
        F.col(id_col).alias("id"), F.explode(F.array(stats)).alias("_s")
    )
    return gen.filter(F.col("_s.n_fingerprints") > 0).select(
        "id",
        "_s.n_fingerprints",
        "_s.min_fingerprint",
        "_s.fingerprint_xor",
    )
