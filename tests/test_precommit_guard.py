"""The precommit guard (scripts/precommit.py) must catch the exact
failure class that shipped in round 7: a test file that no longer
parses, which kills pytest collection for the whole suite."""

import importlib.util
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _load_precommit():
    spec = importlib.util.spec_from_file_location(
        "precommit", REPO / "scripts" / "precommit.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_precommit_compile_check_catches_syntax_error(tmp_path, monkeypatch):
    """The guard's OWN check_compile (not a re-implementation) must fail
    on a tree containing the r7-style unclosed-paren edit and pass once
    it is fixed — exercised against a scratch REPO root so a future
    change to its compile arguments is covered here."""
    pc = _load_precommit()
    monkeypatch.setattr(pc, "REPO", tmp_path)
    (tmp_path / "pkg").mkdir()
    bad = tmp_path / "pkg" / "test_broken.py"
    bad.write_text("assert list(decode(golden) == [1, 2, 3]\n")
    assert not pc.check_compile(["pkg"])
    bad.write_text("assert list([1, 2, 3]) == [1, 2, 3]\n")
    assert pc.check_compile(["pkg"])


def test_precommit_script_passes_on_current_tree():
    """The committed tree must satisfy its own guard end to end
    (compileall over package+tests+scripts, then pytest collection)."""
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "precommit.py")],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "precommit: OK" in proc.stdout
