"""Pathological-skew probe for the span/shingle stats family
(r11 verdict task #1).

The r11 span operators computed per-span stats as
count(*)/min(key) OVER (PARTITION BY span) — a full sort-shuffle on a
corpus-wide Zipf-distributed key. AQE's skew mitigation applies to
joins, not windows, so one fleet-scale boilerplate span (license
header, template) lands its ENTIRE occurrence set in a single window
partition and sort-spills as a straggler. The r12 rewrite materializes
the span stream once and computes the same stats with groupBy(span) —
map-side partial aggregation collapses a hot span to one row per input
task — so the hot key never concentrates anywhere.

This probe measures exactly that cliff, probe_cap_binding.py style:

- `hot` corpus: N short docs, each "b0..b7 r<id> q<id>" — 3 spans per
  doc, the first being the SAME 8-token boilerplate everywhere, so ONE
  span owns ~1/3 of all corpus span occurrences (the verdict asked for
  ~1%; 1/3 makes the single-partition pile-up visible at local scale).
- `uniform` control: same N docs, all 10 tokens id-salted — every span
  unique, no skew anywhere.

Both corpora run through BOTH plans for the span-profile stats
(dedup_span_exact's core): the r11 window form (reconstructed here —
it no longer exists in the library) and the r12 two-phase form (the
live dedup_span_exact). The window form should show hot >> uniform
(the straggler); the two-phase form should be flat (hot ~= uniform).

Writes nothing outside .scale/spanskew (gitignored); prints one JSON
line. Run alone (no concurrent Spark jobs) and take min-of-two — this
host's load spikes inflate single runs.
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Window
from pyspark.sql import functions as F

from iot_database_spark.operators import dedup as dd
from iot_database_spark.operators.dedup_queries import SPAN_N, _materialize_once
from iot_database_spark.operators.hashing import hash64
from iot_database_spark.session import get_spark

ROOT = Path(__file__).resolve().parent.parent / ".scale" / "spanskew"
N_DOCS = 2_000_000

BOILER = " ".join(f"b{i}" for i in range(SPAN_N))


def gen(spark, name: str, hot: bool) -> str:
    """Deterministic 10-token corpus: `hot` prefixes every doc with the
    same 8-token boilerplate (its span = 1/3 of all occurrences);
    `uniform` salts every token with the doc id (all spans unique)."""
    out = ROOT / name
    if out.exists():
        shutil.rmtree(out)
    base = spark.range(N_DOCS).select(F.col("id").alias("doc_id"))
    if hot:
        text = F.concat(
            F.lit(BOILER + " r"), F.col("doc_id"), F.lit(" q"), F.col("doc_id")
        )
    else:
        toks = [
            F.concat(F.lit(f"u{i}x"), F.col("doc_id")) for i in range(SPAN_N + 2)
        ]
        text = F.concat_ws(" ", *toks)
    base.select("doc_id", text.alias("text")).write.mode("overwrite").parquet(
        str(out)
    )
    return str(out)


def _span_stream(spark, path: str):
    docs = (
        spark.read.parquet(path)
        .select(F.col("doc_id").cast("bigint").alias("doc_id"), "text")
        .filter(F.size(F.split("text", " ")) >= SPAN_N)
    )
    return docs.select(
        "doc_id",
        F.array_distinct(
            F.transform(dd.shingles(F.col("text"), SPAN_N), hash64)
        ).alias("arr"),
    )


def window_form(spark, path: str):
    """The r11 plan: df via count(*) OVER (PARTITION BY s)."""
    spans = _span_stream(spark, path).select(
        "doc_id", F.explode("arr").alias("s")
    )
    return (
        spans.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("s")))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_spans"),
            F.count(F.when(F.col("df") >= 2, 1)).cast("bigint").alias("n_dup_spans"),
        )
    )


def two_phase_form(spark, path: str):
    """The r12 plan: materialized doc-arrays, partial-agg stats, no
    join-back (dedup_span_exact's live shape, minus dup_fraction)."""
    doc_arrays = _materialize_once(_span_stream(spark, path))
    spans = doc_arrays.select("doc_id", F.explode("arr").alias("s"))
    stats = spans.groupBy("s").agg(
        F.count(F.lit(1)).alias("df"), F.min("doc_id").alias("min_doc")
    )
    n_uniq = (
        stats.filter(F.col("df") == 1)
        .groupBy(F.col("min_doc").alias("doc_id"))
        .agg(F.count(F.lit(1)).alias("n_uniq"))
    )
    n_spans = doc_arrays.select(
        "doc_id", F.size("arr").cast("bigint").alias("n_spans")
    )
    return n_spans.join(n_uniq, "doc_id", "left").select(
        "doc_id",
        "n_spans",
        (F.col("n_spans") - F.coalesce(F.col("n_uniq"), F.lit(0)))
        .cast("bigint")
        .alias("n_dup_spans"),
    )


def timed(fn, spark, path: str, runs: int = 2) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.time()
        fn(spark, path).collect()
        best = min(best, time.time() - t0)
    return round(best, 2)


def gen_stream(spark, name: str, hot: bool) -> str:
    """Pre-materialized (doc_id, s) span stream for the ISOLATED stats
    probe: STREAM_DOCS docs x 3 spans; `hot` pins span 0 of every doc
    to one key (1/3 of all occurrences), `uniform` salts all three.
    Synthetic keys (no md5) so the timing is pure shuffle/sort/agg."""
    out = ROOT / f"stream_{name}"
    if out.exists():
        shutil.rmtree(out)
    s = F.when(
        F.col("pos") == 0,
        F.lit(0) if hot else F.col("doc_id") * 4,
    ).otherwise(F.col("doc_id") * 4 + F.col("pos"))
    (
        spark.range(STREAM_DOCS)
        .select(F.col("id").alias("doc_id"))
        .select(
            "doc_id", F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("pos")
        )
        .select("doc_id", s.cast("bigint").alias("s"))
        .write.mode("overwrite")
        .parquet(str(out))
    )
    return str(out)


STREAM_DOCS = 6_000_000


def stats_window(spark, path: str):
    """Isolated r11 stats stage: df over the skew-exposed window."""
    sp = spark.read.parquet(path)
    return (
        sp.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("s")))
        .groupBy("doc_id")
        .agg(F.count(F.when(F.col("df") >= 2, 1)).alias("n_dup"))
    )


def stats_two_phase(spark, path: str):
    """Isolated r12 stats stage: partial-agg groupBy + min_doc trick."""
    sp = spark.read.parquet(path)
    stats = sp.groupBy("s").agg(
        F.count(F.lit(1)).alias("df"), F.min("doc_id").alias("min_doc")
    )
    n_uniq = (
        stats.filter(F.col("df") == 1)
        .groupBy(F.col("min_doc").alias("doc_id"))
        .agg(F.count(F.lit(1)).alias("n_uniq"))
    )
    n_spans = sp.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_spans"))
    return n_spans.join(n_uniq, "doc_id", "left").select(
        "doc_id",
        (F.col("n_spans") - F.coalesce(F.col("n_uniq"), F.lit(0))).alias("n_dup"),
    )


def run_end2end(spark) -> dict:
    paths = {
        "hot": gen(spark, "hot", hot=True),
        "uniform": gen(spark, "uniform", hot=False),
    }
    # sanity: both plans agree on the hot corpus's aggregate answer
    agg = lambda df: df.agg(
        F.sum("n_spans").alias("a"), F.sum("n_dup_spans").alias("b")
    ).collect()[0]
    w, t = agg(window_form(spark, paths["hot"])), agg(
        two_phase_form(spark, paths["hot"])
    )
    assert (w.a, w.b) == (t.a, t.b), f"plans disagree: {w} vs {t}"

    result = {"probe": "span_skew_end2end", "n_docs": N_DOCS, "hot_share": "1/3"}
    for corpus, path in paths.items():
        for form, fn in (("window", window_form), ("two_phase", two_phase_form)):
            result[f"{form}_{corpus}_sec"] = timed(fn, spark, path)
            print(json.dumps(result), file=sys.stderr, flush=True)
    result["window_skew_ratio"] = round(
        result["window_hot_sec"] / result["window_uniform_sec"], 2
    )
    result["two_phase_skew_ratio"] = round(
        result["two_phase_hot_sec"] / result["two_phase_uniform_sec"], 2
    )
    return result


def run_stats(spark) -> dict:
    """Isolated stats stage over a pre-materialized stream: strips the
    shingling compute that dilutes the end-to-end ratios, leaving only
    the shuffle/sort/agg path where the straggler lives."""
    result = {"probe": "span_skew_stats", "stream_docs": STREAM_DOCS}
    streams = {
        "hot": gen_stream(spark, "hot", hot=True),
        "uniform": gen_stream(spark, "uniform", hot=False),
    }
    sw, st = (
        stats_window(spark, streams["hot"]).agg(F.sum("n_dup")).collect()[0][0],
        stats_two_phase(spark, streams["hot"]).agg(F.sum("n_dup")).collect()[0][0],
    )
    assert sw == st, f"isolated plans disagree: {sw} vs {st}"
    for corpus, path in streams.items():
        for form, fn in (("window", stats_window), ("two_phase", stats_two_phase)):
            result[f"stats_{form}_{corpus}_sec"] = timed(fn, spark, path)
            print(json.dumps(result), file=sys.stderr, flush=True)
    result["stats_window_skew_ratio"] = round(
        result["stats_window_hot_sec"] / result["stats_window_uniform_sec"], 2
    )
    result["stats_two_phase_skew_ratio"] = round(
        result["stats_two_phase_hot_sec"] / result["stats_two_phase_uniform_sec"],
        2,
    )
    return result


def main() -> None:
    phase = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = get_spark("probe-span-skew")
    if phase in ("all", "end2end"):
        print(json.dumps(run_end2end(spark)), flush=True)
    if phase in ("all", "stats"):
        print(json.dumps(run_stats(spark)), flush=True)


if __name__ == "__main__":
    main()
