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
    hits wins; ties break alphabetically; zero hits -> 'unknown'.

    Implemented as ONE `aggregate` fold: all per-language counters
    advance in a single pass over the token array, and the winner is
    picked in the fold's finish lambda where the accumulator is a BOUND
    VARIABLE (evaluated once). The naive form — one filter() per
    language referenced again inside greatest() and every WHEN branch —
    rebuilds the split/lower/filter tree ~6x per language, and Spark's
    subexpression elimination cannot deduplicate expressions containing
    lambda functions, so that cost was real (r5 honest bench)."""
    langs = sorted(LANG_STOPWORDS.items())
    arrs = {lang: F.array(*[F.lit(x) for x in sw]) for lang, sw in langs}
    words = F.transform(tokens(text), lambda w: F.lower(w))
    acc0 = F.struct(*[F.lit(0).alias(lang) for lang, _ in langs])

    def step(acc: Column, w: Column) -> Column:
        return F.struct(
            *[
                (acc[lang] + F.array_contains(arrs[lang], w).cast("int"))
                .alias(lang)
                for lang, _ in langs
            ]
        )

    def finish(acc: Column) -> Column:
        best = F.greatest(*[acc[lang] for lang, _ in langs])
        out = F.lit("unknown")
        # alphabetical-first tie-break: later (alphabetically greater)
        # candidates only replace 'unknown'
        for lang, _ in reversed(langs):
            out = F.when((acc[lang] == best) & (best > 0), F.lit(lang)).otherwise(out)
        return out

    return F.aggregate(words, acc0, step, finish)


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


def gopher_rules(df: DataFrame, text: str = "text") -> DataFrame:
    """Gopher-style document filter signals (Rae et al. 2021, "Scaling
    Language Models" §A1.1.2 quality heuristics) + the combined pass
    flag. Pure column expressions — one scan, no shuffle:

    - n_words, mean_word_len
    - symbol_word_ratio: '#'/ellipsis occurrences per word
    - bullet_line_frac / ellipsis_line_frac: lines starting with a
      bullet / ending with an ellipsis
    - dup_line_frac: 1 - distinct(lines)/lines
    - alpha_word_frac: words containing at least one letter
    - stop_hits: distinct hits from a tiny English stopword list
    - pass_gopher: the conjunction with the published thresholds
      (50..100k words, mean word length 3..10, symbol ratio < .1,
      bullets < .9, ellipsis < .3, alpha > .8, >= 2 stopword kinds,
      duplicate lines < .3)
    """
    t = F.col(text)
    words = tokens(t)
    n_words = F.size(words)
    nw = F.greatest(n_words, F.lit(1)).cast("double")
    lines = F.split(t, "\n")
    n_lines = F.greatest(F.size(lines), F.lit(1)).cast("double")

    def occurrences(sub: str) -> Column:
        return (
            (F.length(t) - F.length(F.replace(t, F.lit(sub), F.lit(""))))
            / len(sub)
        ).cast("bigint")

    symbol_ratio = (occurrences("#") + occurrences("...")) / nw
    bullet_frac = (
        F.size(
            F.filter(
                lines,
                lambda l: F.trim(l).rlike("^[-*•]"),
            )
        )
        / n_lines
    )
    ellipsis_frac = (
        F.size(F.filter(lines, lambda l: F.trim(l).rlike("\\.\\.\\.$"))) / n_lines
    )
    dup_line_frac = F.lit(1.0) - F.size(F.array_distinct(lines)) / n_lines
    alpha_frac = (
        F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))) / nw
    )
    sw = F.array(*[F.lit(w) for w in LANG_STOPWORDS["en"]])
    lowered = F.transform(words, lambda w: F.lower(w))
    stop_hits = F.size(F.filter(sw, lambda s: F.array_contains(lowered, s)))

    out = df.select(
        *df.columns,
        n_words.cast("bigint").alias("n_words"),
        mean_token_len(t).alias("mean_word_len"),
        symbol_ratio.alias("symbol_word_ratio"),
        bullet_frac.alias("bullet_line_frac"),
        ellipsis_frac.alias("ellipsis_line_frac"),
        dup_line_frac.alias("dup_line_frac"),
        alpha_frac.alias("alpha_word_frac"),
        stop_hits.cast("bigint").alias("stop_hits"),
    )
    return out.withColumn(
        "pass_gopher",
        (F.col("n_words") >= 50)
        & (F.col("n_words") <= 100000)
        & (F.col("mean_word_len") >= 3)
        & (F.col("mean_word_len") <= 10)
        & (F.col("symbol_word_ratio") < 0.1)
        & (F.col("bullet_line_frac") < 0.9)
        & (F.col("ellipsis_line_frac") < 0.3)
        & (F.col("dup_line_frac") < 0.3)
        & (F.col("alpha_word_frac") > 0.8)
        & (F.col("stop_hits") >= 2),
    )


# PII patterns chosen to behave identically under Java regex (Spark) and
# RE2 (DuckDB): no backrefs, no lookaround.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("phone", r"\d{2}-\d{3}-\d{3}-\d{4}", "[PHONE]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
)


def scrub_pii(df: DataFrame, text: str = "text") -> DataFrame:
    """Redact emails / phone numbers / IPv4s and count each kind — the
    pre-training scrub pass. regexp_replace chains stay in codegen; one
    scan, no Python."""
    t = F.col(text)
    counts = [
        F.size(F.regexp_extract_all(t, F.lit(pat), F.lit(0)))
        .cast("bigint")
        .alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    scrubbed = t
    for _, pat, repl in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return df.select(*df.columns, *counts, scrubbed.alias("scrubbed"))


def chunk_documents(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    overlap: int = 8,
) -> DataFrame:
    """Split documents into fixed-size token-window chunks with overlap —
    the context-window prep step of a training pipeline. One row per
    chunk: (doc_id, chunk_idx, n_chunk_tokens, chunk_text).

    Shape: words array -> chunk start indices via sequence(stride) ->
    posexplode -> slice + rejoin. Per-row compute then one Generate —
    linear scan, no shuffle; chunk boundaries are deterministic so the
    output is reproducible across runs and engines."""
    stride = chunk_tokens - overlap
    if stride <= 0:
        raise ValueError("chunk_tokens must exceed overlap")
    words = F.split(F.col(text), " ")
    # starts: 1, 1+stride, ... while start <= max(n - overlap, 1) —
    # guarantees the final partial chunk is emitted exactly once
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.size(words) - F.lit(overlap), F.lit(1)),
        F.lit(stride),
    )
    chunked = df.select(
        F.col(id_col),
        words.alias("_w"),
        F.posexplode(starts).alias("chunk_idx", "_start"),
    )
    piece = F.slice(F.col("_w"), F.col("_start"), chunk_tokens)
    return chunked.select(
        id_col,
        "chunk_idx",
        F.size(piece).alias("n_chunk_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


# HTML entity table shared with the oracle builder: applied AFTER tag
# removal, longest-first so '&amp;lt;' never double-decodes via '&amp;'.
HTML_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&nbsp;", " "),
)


def strip_html(col: Column) -> Column:
    """Boilerplate removal for web-scraped corpora: drop tags, decode the
    common entities, collapse whitespace. Pure regexp_replace/replace
    chain — whole-stage codegen, no Python, one scan. Script/style
    blocks are removed WITH their contents first (their text is not
    document text); remaining tags are replaced by a space so adjacent
    words don't fuse."""
    # two explicit patterns, not one with a </\1> backreference: the
    # DuckDB oracle's RE2 engine has no backreferences, and the Spark
    # plan must apply the exact same regexes to stay hash-identical
    out = F.regexp_replace(col, r"(?is)<script[^>]*>.*?</script\s*>", " ")
    out = F.regexp_replace(out, r"(?is)<style[^>]*>.*?</style\s*>", " ")
    out = F.regexp_replace(out, r"<[^>]*>", " ")
    for ent, ch in HTML_ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def corpus_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: tuple[int, int, int] = (96, 2, 2),
    salt: str = "split-v1",
) -> DataFrame:
    """Deterministic hash-based train/val/test assignment: stable under
    corpus growth (a document's split never changes when other documents
    are added/removed), reproducible across engines via the portable
    md5-prefix hash, and shuffle-free."""
    from iot_database_spark.operators.hashing import hash64

    total = sum(weights)
    bucket = F.pmod(hash64(F.concat(F.lit(salt), F.lit(":"), F.col(id_col).cast("string"))), F.lit(total))
    return df.select(
        *df.columns,
        F.when(bucket < weights[0], "train")
        .when(bucket < weights[0] + weights[1], "val")
        .otherwise("test")
        .alias("split"),
    )
