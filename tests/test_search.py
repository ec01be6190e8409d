"""Semantic tests for full-text / hybrid search (operators/search.py)
and sequence packing (curation.pack_sequences): known-corpus BM25
ranking, exact RRF arithmetic, and pack reassembly invariants.

The cross-engine value-hash checks for the registered queries live in
test_oracle_parity.py; these tests pin the SEMANTICS on constructed
inputs where the right answer is known by hand.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iot_database_spark.operators import curation as cu
from iot_database_spark.operators import search as se


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "rare common common common filler filler"),
        (1, "common filler filler filler filler filler"),
        (2, "common common filler filler filler filler"),
        (3, "filler filler filler filler filler filler"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_bm25_rare_term_outranks_common(corpus):
    top = se.bm25_topk(corpus, ["rare", "common"], k=4).collect()
    # doc 0 holds the only 'rare' occurrence -> highest idf mass
    assert top[0]["doc_id"] == 0
    assert top[0]["n_terms_matched"] == 2
    # doc 3 matches nothing and must be absent entirely
    assert all(r["doc_id"] != 3 for r in top)
    assert len(top) == 3


def test_bm25_tf_monotone_same_length(corpus):
    scores = {
        r["id"]: r["score_micro"]
        for r in se.bm25_scores(corpus, ["common"]).collect()
    }
    # equal doc lengths -> more occurrences of the term, higher score
    assert scores[0] > scores[2] > scores[1]


def test_rrf_fusion_exact_values(spark):
    a = spark.createDataFrame([(10, 1), (20, 2)], ["id", "r"])
    b = spark.createDataFrame([(20, 1), (30, 2)], ["id", "r"])
    got = {
        r["id"]: (r["r_a"], r["r_b"], r["rrf_score"])
        for r in se.rrf_fuse(a, b, on="id").collect()
    }
    assert got[20] == (2, 1, (1.0 / 62) + (1.0 / 61))  # in both lists
    assert got[10] == (1, 1000, (1.0 / 61) + (1.0 / 1060))
    assert got[30] == (1000, 2, (1.0 / 1060) + (1.0 / 62))


def test_ranked_is_topk_with_dense_ranks(corpus):
    bm = se.bm25_scores(corpus, ["common"])
    r = se.ranked(bm, [F.col("score_micro").desc(), F.col("id")], k=2).collect()
    assert [row["r"] for row in r] == [1, 2]
    assert len(r) == 2


@pytest.fixture(scope="module")
def packable(spark):
    # stream 'a': 3+4+2 = 9 tokens; budget 4 -> packs of 4/4/1
    # stream 'b': 6 tokens -> packs of 4/2
    rows = [
        ("a", 1, "w w w"),
        ("a", 2, "x x x x"),
        ("a", 3, "y y"),
        ("b", 1, "z z z z z z"),
    ]
    return spark.createDataFrame(rows, ["source", "doc_id", "text"])


def test_pack_slices_cover_each_doc(packable):
    out = cu.pack_sequences(packable, budget=4).collect()
    per_doc = {}
    for r in out:
        per_doc.setdefault((r["source"], r["doc_id"]), []).append(r)
    # every document's slices are contiguous from offset 0 and sum to
    # its token count
    toks = {("a", 1): 3, ("a", 2): 4, ("a", 3): 2, ("b", 1): 6}
    for key, slices in per_doc.items():
        slices.sort(key=lambda r: r["doc_off"])
        assert slices[0]["doc_off"] == 0
        assert sum(r["n_tok"] for r in slices) == toks[key]
        pos = 0
        for s in slices:
            assert s["doc_off"] == pos
            pos += s["n_tok"]


def test_packs_are_full_except_last(packable):
    out = cu.pack_sequences(packable, budget=4).collect()
    per_pack = {}
    for r in out:
        per_pack.setdefault((r["source"], r["pack_id"]), 0)
        per_pack[(r["source"], r["pack_id"])] += r["n_tok"]
    assert per_pack == {
        ("a", 0): 4,
        ("a", 1): 4,
        ("a", 2): 1,
        ("b", 0): 4,
        ("b", 1): 2,
    }


def test_doc_straddles_pack_boundary(packable):
    out = [
        r
        for r in cu.pack_sequences(packable, budget=4).collect()
        if r["source"] == "a" and r["doc_id"] == 2
    ]
    # doc a/2 occupies stream offsets 3..6 -> packs 0 (1 token) and 1
    # (3 tokens), entering pack 1 at position 0
    by_pack = {r["pack_id"]: r for r in out}
    assert by_pack[0]["n_tok"] == 1 and by_pack[0]["pack_off"] == 3
    assert by_pack[1]["n_tok"] == 3 and by_pack[1]["pack_off"] == 0
    assert by_pack[1]["doc_off"] == 1
