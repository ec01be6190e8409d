#!/usr/bin/env python
"""Pre-commit / pre-snapshot guard: a commit with an uncollectable test
suite must be impossible.

Round 7 shipped a mechanical edit that left SyntaxErrors in two test
files; `pytest tests/` then failed at COLLECTION, so zero tests ran and
the end-of-round snapshot recorded a suite that could not even parse.
This script is the cheap structural gate the snapshot flow (and any
human committer) runs first:

  1. `compileall` over the package and tests — every .py must parse and
     byte-compile (catches the exact r7 failure class in <2 s);
  2. `pytest --collect-only -q` — every test module must import and
     collect (catches broken imports/fixtures that compile fine).

Exit code 0 = safe to commit. Non-zero = do NOT commit; the offending
file is in the output. Run as `python scripts/precommit.py` from the
repo root. It deliberately does NOT run the tests themselves — it is a
structural guard, not a substitute for `pytest tests/`.
"""

from __future__ import annotations

import compileall
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def check_compile(targets: list[str]) -> bool:
    ok = True
    for t in targets:
        # quiet=1 prints errors only; force so a stale .pyc can't mask
        # a fresh syntax error
        if not compileall.compile_dir(
            str(REPO / t), quiet=1, force=True, workers=0
        ):
            ok = False
    return ok


def check_collect() -> bool:
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "--collect-only", "-q", "tests/"],
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    if proc.returncode != 0:
        sys.stderr.write(proc.stdout[-4000:])
        sys.stderr.write(proc.stderr[-4000:])
    return proc.returncode == 0


def main() -> int:
    if not check_compile(["iot_database_spark", "tests", "scripts"]):
        print("precommit: FAIL — syntax/compile error (see above)")
        return 1
    if not check_collect():
        print("precommit: FAIL — pytest could not collect tests/")
        return 2
    print("precommit: OK — all sources compile, test suite collects")
    return 0


if __name__ == "__main__":
    sys.exit(main())
