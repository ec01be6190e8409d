"""STAGED FOR ROUND 14 — implemented and oracle-tested, NOT registered.

The r13 driver window is exactly full (150 registered queries, 50-slot
window, zero slack — registry.py's SATURATION note), and the rotation
policy requires any new registration to retire a query via
scripts/plan_rotation.py in the round it first grades. This operator is
therefore built and bit-exact-tested against its DuckDB oracle now
(tests/test_staged_r14.py runs the SAME _assert_parity gate the
registered queries use), and registers at the start of round 14 — where
plan_rotation.RETIREMENT_CANDIDATES names the slot it takes — so
registration is a pure window/rotation step, not a correctness event.
(Same staging discipline as operators/staged_r11.py, retired into home
modules at r11.)

This module is deliberately NOT in registry._ensure_loaded's import
list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from iot_database_spark.operators.hashing import duck_hash64, hash64
from iot_database_spark.registry import load_views

# ---------------------------------------------------------------------------
# Token-budget-constrained corpus selection (the data-mixing step of a
# training run: "take the best documents until the token budget is
# spent" — DCLM / FineWeb-style curation ends exactly here, and at
# 100 TB the naive form is a full-corpus ORDER BY with a running sum,
# i.e. one sort + ONE partition holding every row's prefix state).
# ---------------------------------------------------------------------------

_QSEL_SALT = "qsel-v1"
RANGE_W = 4096  # docs per refinement range — caps every exact window
_BUDGET_DIV = 4  # budget = corpus tokens // 4

TOKEN_BUDGET_ORACLE = f"""
    WITH d AS (
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               {duck_hash64(f"'{_QSEL_SALT}:' || CAST(doc_id AS VARCHAR)")}
                   % 10000 AS quality_bp
        FROM documents
    ),
    b AS (SELECT CAST(SUM(n_tokens) // {_BUDGET_DIV} AS BIGINT) AS budget
          FROM d),
    c AS (SELECT *, SUM(n_tokens) OVER (ORDER BY quality_bp DESC, doc_id)
                        AS cum
          FROM d)
    SELECT doc_id, quality_bp, n_tokens FROM c, b WHERE cum <= budget
"""


def corpus_token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy quality-ranked document selection under a global token
    budget: take documents in (quality DESC, doc_id ASC) order while
    the running token total stays within budget (inclusive prefix).
    `quality_bp` here is a deterministic hash stand-in for any scored
    quality column (same convention as corpus_quality_resample's
    length-proportional rate); the budget is 1/{_BUDGET_DIV} of the
    corpus's total tokens, computed in-plan from a broadcast one-row
    aggregate — no driver-side scalar.

    Scale shape — a global ORDER-BY-with-running-sum without the global
    sort. The prefix predicate `cum <= B` is a global order statistic;
    the oracle's direct form needs every row's prefix state in ONE task.
    Instead the selection decomposes exactly along the order's two keys:

    1. bucket tier — quality_bp has <= 10,000 distinct values, so a
       partial-aggregated groupBy gives per-bucket token totals and a
       running sum over THAT aggregate is a window over <= 10,000 rows
       (bounded by the value domain, not the corpus). Buckets whose
       inclusive cum <= B are selected wholesale via a broadcast join —
       no per-doc ordering ever touches them.
    2. range tier — only the ONE boundary bucket (cum_before < B <
       cum_incl) needs intra-bucket order. Its docs group into
       RANGE_W={RANGE_W}-doc id-ranges; per-range totals + a running
       sum over ranges (rows = boundary-bucket docs / {RANGE_W})
       select whole ranges the same way.
    3. prefix tier — only the ONE boundary RANGE (<= {RANGE_W} docs)
       gets an exact per-doc running-sum window, partitioned by its
       range id so the partition is width-capped by construction.

    Every window in the plan is therefore bounded (10k / n-ranges /
    {RANGE_W} rows) regardless of corpus size, and the three tiers
    reconstruct the greedy prefix bit-exactly because bucket order +
    range order + in-range order IS (quality_bp DESC, doc_id ASC).
    At 1000 executors the heavy work is two partial-aggregated
    groupBys and broadcast joins; the reference's engine has no
    analogous operator (selection there is a client-side loop over a
    sorted cursor — Query/QueryBuilder.cs materializes the ordered
    stream to walk it)."""
    from iot_database_spark.operators.dedup_queries import _materialize_once

    tables = load_views(spark, sf_dir)
    # materialize the (id, tokens, quality) triple once: the three-tier
    # union otherwise re-derives it per branch — 3+ full corpus scans
    # and re-tokenizations for a stream of ~24 bytes/doc (measured on
    # the un-materialized form: 42 exchanges / 8 windows at sf1; the
    # materialized plan re-reads stored blocks instead)
    d = _materialize_once(
        tables["documents"].select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
            (
                hash64(
                    F.concat(
                        F.lit(f"{_QSEL_SALT}:"), F.col("doc_id").cast("string")
                    )
                )
                % 10000
            ).alias("quality_bp"),
        )
    )

    budget = d.groupBy().agg(
        F.expr(f"CAST(SUM(n_tokens) DIV {_BUDGET_DIV} AS BIGINT)").alias("budget")
    )
    # broadcast 1-row aggregate — the repo-wide scalar-gating pattern
    return token_budget_select(d.crossJoin(F.broadcast(budget)))


def token_budget_select(d: DataFrame) -> DataFrame:
    """Library core of corpus_token_budget_select: `d` carries
    (doc_id, n_tokens, quality_bp, budget) — the query wraps it with
    the hash stand-in quality and an in-plan budget; probes feed it
    adversarial distributions directly (scripts/probe_budget_skew.py).
    Returns the greedy (quality_bp DESC, doc_id ASC) prefix whose
    inclusive token sum stays <= budget, via the three bounded tiers
    described in the query docstring."""
    # tier 1: bucket running sum over the <=10k-row quality aggregate
    buckets = d.groupBy("quality_bp", "budget").agg(
        F.sum("n_tokens").alias("bucket_tokens")
    )
    bw = Window.partitionBy("budget").orderBy(F.desc("quality_bp"))
    buckets = buckets.withColumn(
        "bucket_cum", F.sum("bucket_tokens").over(bw)
    ).select(
        "quality_bp",
        (F.col("bucket_cum") - F.col("bucket_tokens")).alias("bucket_before"),
        "bucket_cum",
    )
    d = d.join(F.broadcast(buckets), "quality_bp")

    full_buckets = d.filter(F.col("bucket_cum") <= F.col("budget"))
    boundary = d.filter(
        (F.col("bucket_before") < F.col("budget"))
        & (F.col("bucket_cum") > F.col("budget"))
    ).withColumn("rng", F.expr(f"doc_id DIV {RANGE_W}"))

    # tier 2: range running sum within the single boundary bucket
    ranges = boundary.groupBy("rng", "budget", "bucket_before").agg(
        F.sum("n_tokens").alias("range_tokens")
    )
    rw = Window.partitionBy("budget").orderBy("rng")
    ranges = ranges.withColumn("range_cum", F.sum("range_tokens").over(rw)).select(
        "rng",
        (F.col("range_cum") - F.col("range_tokens")).alias("range_before"),
        "range_cum",
    )
    boundary = boundary.join(F.broadcast(ranges), "rng")
    remaining = F.col("budget") - F.col("bucket_before")

    full_ranges = boundary.filter(F.col("range_cum") <= remaining)

    # tier 3: exact per-doc prefix inside the single boundary range
    # (<= RANGE_W rows; the window partitions on rng so the cap is
    # structural, not statistical)
    edge = boundary.filter(
        (F.col("range_before") < remaining) & (F.col("range_cum") > remaining)
    )
    ew = Window.partitionBy("rng").orderBy("doc_id")
    edge = edge.withColumn("doc_cum", F.sum("n_tokens").over(ew)).filter(
        F.col("range_before") + F.col("doc_cum") <= remaining
    )

    out = ("doc_id", "quality_bp", "n_tokens")
    return (
        full_buckets.select(*out)
        .unionByName(full_ranges.select(*out))
        .unionByName(edge.select(*out))
    )


STAGED_QUERIES = {"corpus_token_budget_select": corpus_token_budget_select}
STAGED_ORACLES = {"corpus_token_budget_select": TOKEN_BUDGET_ORACLE}
