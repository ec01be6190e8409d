"""Staged round-11 operators (operators/staged_r11.py) must pass the
SAME bit-exact DuckDB gate as registered queries BEFORE they are
registered — registration in r11 is then a pure window/rotation step,
not a correctness event."""

from __future__ import annotations

import pytest

import tests.test_oracle_parity as top
from iot_database_spark.operators import staged_r11 as st


@pytest.mark.parametrize("name", sorted(st.STAGED_ORACLES))
def test_staged_parity(name, spark, sf_dir, monkeypatch):
    monkeypatch.setitem(top._QUERIES, name, st.STAGED_QUERIES[name])
    monkeypatch.setitem(top._ORACLES, name, st.STAGED_ORACLES[name])
    top._assert_parity(name, spark, sf_dir)


def test_staged_not_registered():
    """The r10 evidence policy: nothing registers without a same-round
    driver slot. These stay out of the registry until r11."""
    from iot_database_spark import registry

    assert not set(st.STAGED_QUERIES) & set(registry.queries())


def test_phrase_and_span_results_nonempty(spark, sf_dir):
    """Guard against a vacuous gate: the graded phrase actually occurs
    and the synthetic corpus actually contains cross-doc duplicate
    spans, so the parity check compares real rows, not empty sets."""
    assert st.search_phrase_topk(spark, sf_dir).count() > 0
    dup = st.dedup_span_exact(spark, sf_dir).filter("n_dup_spans > 0")
    assert dup.count() > 0
