"""The precommit guard (scripts/precommit.py) must catch the exact
failure class that shipped in round 7: a test file that no longer
parses, which kills pytest collection for the whole suite."""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_precommit_compile_check_catches_syntax_error(tmp_path):
    """check_compile on a tree containing the r7-style unclosed-paren
    edit must fail; on the fixed form it must pass."""
    sys.path.insert(0, str(REPO / "scripts"))
    try:
        import compileall

        bad = tmp_path / "test_broken.py"
        bad.write_text("assert list(decode(golden) == [1, 2, 3]\n")
        assert not compileall.compile_dir(
            str(tmp_path), quiet=1, force=True, workers=0
        )
        bad.write_text("assert list([1, 2, 3]) == [1, 2, 3]\n")
        assert compileall.compile_dir(
            str(tmp_path), quiet=1, force=True, workers=0
        )
    finally:
        sys.path.remove(str(REPO / "scripts"))


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
