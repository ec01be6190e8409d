"""Staged round-14 operator (operators/staged_r14.py) must pass the
SAME bit-exact DuckDB gate as registered queries BEFORE it registers —
registration in r14 is then a pure window/rotation step, not a
correctness event (the staged_r11 discipline)."""

from __future__ import annotations

import pytest

import tests.test_oracle_parity as top
from iot_database_spark.operators import staged_r14 as st


@pytest.mark.parametrize("name", sorted(st.STAGED_ORACLES))
def test_staged_parity(name, spark, sf_dir, monkeypatch):
    monkeypatch.setitem(top._QUERIES, name, st.STAGED_QUERIES[name])
    monkeypatch.setitem(top._ORACLES, name, st.STAGED_ORACLES[name])
    top._assert_parity(name, spark, sf_dir)


def test_staged_not_registered():
    """The evidence policy: nothing registers without a same-round
    driver slot. This stays out of the registry until r14."""
    from iot_database_spark import registry

    assert not set(st.STAGED_QUERIES) & set(registry.queries())


def test_budget_filled_to_within_one_document(spark, sf_dir):
    """Non-vacuity + decomposition guard: the greedy prefix must spend
    the budget to within the largest selected-boundary document — a
    selection that stops at a bucket or range boundary (a broken tier
    hand-off) leaves a gap this catches. Also: selection is a strict
    non-empty subset, so the parity gate compares real rows."""
    from pyspark.sql import functions as F

    from iot_database_spark.registry import load_views

    sel = st.corpus_token_budget_select(spark, sf_dir)
    docs = load_views(spark, sf_dir)["documents"]
    total = docs.select(
        F.sum(F.size(F.split("text", " ")).cast("bigint"))
    ).first()[0]
    budget = total // 4

    agg = sel.agg(
        F.sum("n_tokens").alias("spent"),
        F.count(F.lit(1)).alias("n_sel"),
    ).first()
    n_docs = docs.count()
    assert 0 < agg["n_sel"] < n_docs
    # every selected doc fits: inclusive-prefix semantics
    assert agg["spent"] <= budget
    # greedy: the next doc in order would not fit, so the shortfall is
    # smaller than the largest possible next document — bound it by the
    # corpus-wide max doc size (loose but implementation-independent)
    max_doc = docs.select(
        F.max(F.size(F.split("text", " ")).cast("bigint"))
    ).first()[0]
    assert budget - agg["spent"] < max_doc


def test_selection_is_quality_prefix(spark, sf_dir):
    """The selected set must be EXACTLY the greedy prefix: no selected
    doc may rank below an unselected one in (quality DESC, doc_id ASC)
    order unless the budget boundary sits between them — equivalently,
    the worst selected (quality_bp, doc_id) must rank above the best
    unselected doc that would still have fit in the remaining budget."""
    from pyspark.sql import functions as F

    sel = st.corpus_token_budget_select(spark, sf_dir)
    rows = sel.select("quality_bp", "doc_id").collect()
    picked = {r["doc_id"] for r in rows}
    worst = min((r["quality_bp"], -r["doc_id"]) for r in rows)
    # every doc strictly better than the worst selected one is selected
    better = (
        st.corpus_token_budget_select(spark, sf_dir)
        .sparkSession.table("documents")
        .select(F.col("doc_id").cast("bigint").alias("doc_id"))
    )
    from iot_database_spark.operators.hashing import hash64

    allq = better.withColumn(
        "quality_bp",
        hash64(
            F.concat(F.lit("qsel-v1:"), F.col("doc_id").cast("string"))
        )
        % 10000,
    ).collect()
    for r in allq:
        if (r["quality_bp"], -r["doc_id"]) > worst:
            assert r["doc_id"] in picked, (
                f"doc {r['doc_id']} (q={r['quality_bp']}) outranks the "
                "worst selected doc but was not selected"
            )


def test_token_budget_select_hand_computed(spark):
    """Library-core semantics on a hand-checkable frame: budget 100,
    order = (quality DESC, doc_id ASC), inclusive prefix. Docs:
      q=9: d1(40), d2(30)   -> cum 40, 70   (whole bucket fits)
      q=5: d3(20), d4(15)   -> cum 90, 105  (d3 fits, d4 would overflow)
      q=1: d5(10)           -> never reached
    Selected = {d1, d2, d3}."""
    from pyspark.sql import functions as F

    from iot_database_spark.operators.staged_r14 import token_budget_select

    rows = [(1, 40, 9), (2, 30, 9), (3, 20, 5), (4, 15, 5), (5, 10, 1)]
    d = spark.createDataFrame(
        rows, "doc_id long, n_tokens long, quality_bp long"
    ).withColumn("budget", F.lit(100).cast("bigint"))
    got = sorted(r["doc_id"] for r in token_budget_select(d).collect())
    assert got == [1, 2, 3]


def test_token_budget_select_boundary_exact_fit(spark):
    """cum == budget is INCLUSIVE (<=), and a budget landing exactly
    between buckets selects whole buckets with no boundary refinement."""
    from pyspark.sql import functions as F

    from iot_database_spark.operators.staged_r14 import token_budget_select

    rows = [(1, 60, 9), (2, 40, 5), (3, 10, 1)]
    d = spark.createDataFrame(
        rows, "doc_id long, n_tokens long, quality_bp long"
    ).withColumn("budget", F.lit(100).cast("bigint"))
    got = sorted(r["doc_id"] for r in token_budget_select(d).collect())
    assert got == [1, 2]
