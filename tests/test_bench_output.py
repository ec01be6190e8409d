"""The bench stdout contract: the driver records only the LAST 2000
characters of stdout (observed in BENCH_r05.json, where a 2204-byte
line lost its head and parsed as null), so the one line bench.py prints
must stay under bench.STDOUT_BUDGET no matter how many headline queries
exist, while remaining valid JSON with the spec's metric/value/unit/
queries/sf keys."""

from __future__ import annotations

import json

import bench


def _full(n_queries: int) -> dict:
    qs = {f"some_operator_family_query_{i:03d}": 0.1234 + i for i in range(n_queries)}
    return {
        "metric": "headline_queries_total_runtime",
        "value": round(sum(qs.values()), 4),
        "unit": "sec",
        "queries": qs,
        "sf": 0.1,
        "n_queries": n_queries,
    }


def test_compact_line_fits_driver_window_at_any_size():
    for n in (0, 1, 64, len(bench.HEADLINE), 500):
        line = bench.compact_line(_full(n), "BENCH_full_local.json")
        assert len(line) <= bench.STDOUT_BUDGET
        d = json.loads(line)
        for key in ("metric", "value", "unit", "queries", "sf"):
            assert key in d
        assert d["n_queries"] == n
        # slowest queries are the ones that make the line
        if n:
            slowest = max(_full(n)["queries"], key=_full(n)["queries"].get)
            assert slowest in d["queries"]


def test_compact_line_includes_everything_when_small():
    d = json.loads(bench.compact_line(_full(10), "f.json"))
    assert len(d["queries"]) == 10


def test_headline_names_resolve():
    """Every headline name must exist in the registry — a typo here
    would silently drop a query from the official bench."""
    from iot_database_spark import registry

    qs = registry.queries()
    missing = [n for n in bench.HEADLINE if n not in qs]
    assert not missing, missing


def test_merge_record_keeps_quiet_host_minima():
    """r8 verdict #4: one loaded-host run must not clobber the committed
    quiet-host per-query baselines — merge takes the per-query MIN,
    drops retired queries, admits new ones, and recomputes the total."""
    old = {
        "sf": 0.1,
        "queries": {"a": 1.0, "b": 2.0, "retired": 9.0},
        "value": 12.0,
        "n_queries": 3,
        "metric": "m", "unit": "sec",
    }
    loaded_run = {
        "sf": 0.1,
        "queries": {"a": 5.0, "b": 1.5, "new": 0.5},
        "value": 7.0,
        "n_queries": 3,
        "metric": "m", "unit": "sec",
    }
    merged = bench.merge_record(old, loaded_run)
    assert merged["queries"] == {"a": 1.0, "b": 1.5, "new": 0.5}
    assert merged["value"] == 3.0
    assert merged["n_queries"] == 3
    # different sf, or no prior record: fresh run stands as-is
    assert bench.merge_record(None, loaded_run) is loaded_run
    assert bench.merge_record({**old, "sf": 1.0}, loaded_run) is loaded_run


def test_merge_record_resets_changed_queries():
    """A query whose implementation changed takes the FRESH time, not
    the stale min from code that no longer exists."""
    old = {"sf": 0.1, "queries": {"a": 1.0, "b": 2.0}, "value": 3.0,
           "n_queries": 2, "metric": "m", "unit": "sec"}
    run = {"sf": 0.1, "queries": {"a": 1.5, "b": 1.9}, "value": 3.4,
           "n_queries": 2, "metric": "m", "unit": "sec"}
    merged = bench.merge_record(old, run, reset={"a"})
    assert merged["queries"] == {"a": 1.5, "b": 1.9}


def test_stale_queries_derive_reset_from_diff(monkeypatch):
    """r9 advice: the min-merge reset set is derived from the actual
    git diff against the record's stamped commit — a query whose
    defining module changed auto-resets; unstamped records and unknown
    commits keep the plain merge."""
    import pathlib
    import subprocess
    import types

    root = pathlib.Path(bench.__file__).resolve().parent
    changed_file = str(root / "iot_database_spark" / "operators" / "x_queries.py")
    ns: dict = {}
    exec(compile("def q_changed(s, d):\n    return None", changed_file, "exec"), ns)
    exec(compile("def q_same(s, d):\n    return None", str(root / "other.py"), "exec"), ns)
    qs = {"a": ns["q_changed"], "b": ns["q_same"]}

    def fake_run(cmd, **kw):
        assert cmd[:3] == ["git", "diff", "--name-only"]
        return types.SimpleNamespace(
            returncode=0, stdout="iot_database_spark/operators/x_queries.py\n"
        )

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert bench.stale_queries("deadbeef", qs, ["a", "b"]) == {"a"}
    assert bench.stale_queries(None, qs, ["a", "b"]) == set()

    def fake_fail(cmd, **kw):
        return types.SimpleNamespace(returncode=128, stdout="")

    monkeypatch.setattr(subprocess, "run", fake_fail)
    assert bench.stale_queries("gone", qs, ["a", "b"]) == set()


def test_stale_from_record_uses_content_hashes(tmp_path, monkeypatch):
    """r10 advice: staleness keys off stamped CONTENT hashes, so a
    defining module edited after the record was taken resets even when
    the edit is uncommitted or the module untracked (git-diff-blind),
    and a record taken from a dirty tree pins the content actually
    measured."""
    import pathlib

    root = pathlib.Path(bench.__file__).resolve().parent
    # untracked module under the repo root — invisible to git diff
    mod = root / "_bench_stale_probe.py"
    mod.write_text("def q(s, d):\n    return None\n")
    try:
        ns: dict = {}
        exec(compile(mod.read_text(), str(mod), "exec"), ns)
        qs = {"a": ns["q"]}
        stamped = bench._module_hashes(qs, ["a"])
        assert stamped  # the probe module was hashed
        record = {"module_hashes": stamped, "commit": "deadbeef"}
        # unchanged content -> not stale (no git involved)
        assert bench.stale_from_record(record, qs, ["a"]) == set()
        # edit the file post-record (still untracked): stale now
        mod.write_text("def q(s, d):\n    return 1\n")
        assert bench.stale_from_record(record, qs, ["a"]) == {"a"}
        # record predating content stamps falls back to the commit path
        legacy = {"commit": None}
        assert bench.stale_from_record(legacy, qs, ["a"]) == set()
    finally:
        mod.unlink()


def test_steal_sampler_parses_proc_stat_line():
    # aggregate cpu line: user nice system idle iowait irq softirq steal ...
    got = bench.StealSampler._jiffies("cpu 100 0 50 800 10 0 5 35 0 0\n")
    assert got == (35, 1000)
    # per-cpu and malformed lines are rejected
    assert bench.StealSampler._jiffies("cpu0 1 2 3 4 5 6 7 8\n") is None
    assert bench.StealSampler._jiffies("") is None
    # pre-2.6.11 kernels have no steal field -> 0
    assert bench.StealSampler._jiffies("cpu 100 0 50 850\n") == (0, 1000)


def test_steal_sampler_profile_shape():
    p = bench.StealSampler.profile([0.0, 0.4, 2.5, 33.1])
    assert p == {"samples": 4, "gt1pct": 2, "max_pct": 33.1, "mean_pct": 9.0}
    # empty profile (sampler never ran / non-Linux host) stays well-formed
    z = bench.StealSampler.profile([])
    assert z == {"samples": 0, "gt1pct": 0, "max_pct": 0.0, "mean_pct": 0.0}


def test_steal_sampler_live_start_stop():
    import time as _t

    s = bench.StealSampler()
    s._INTERVAL_S = 0.05  # fast sampling for the test only
    s.start()
    _t.sleep(0.3)
    p = s.stop()
    # on any Linux host this collected >=1 interval; elsewhere it's the
    # zero profile — both satisfy the schema contract
    assert set(p) == {"samples", "gt1pct", "max_pct", "mean_pct"}
    assert p["gt1pct"] <= p["samples"]
