"""Capture `.explain("formatted")` for registered queries into plans/<tag>/.

Usage:
    python scripts/capture_plans.py <suffix> [name,name,...]

Writes plans/r13/<query>_<suffix>.txt for each requested query (default:
every bench HEADLINE query). The optimization judge reads these files to
verify plan-shape claims (Exchange counts, join strategies, PushedFilters,
Python-eval nodes) without running Spark.

Streaming queries can't produce a batch physical plan for the streaming
stage itself; for those the file records the plan of the RETURNED frame
(the landed sink read) plus a note. Queries whose construction runs eager
jobs (materialization, stream lifecycles) still work — we only pay them
once here.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from iot_database_spark import registry  # noqa: E402
from iot_database_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# plans/<tag>/ — one dir per optimization round ($SPARK_GRAFT_PLAN_TAG)
OUT_DIR = (
    Path(__file__).resolve().parent.parent
    / "plans"
    / os.environ.get("SPARK_GRAFT_PLAN_TAG", "r14")
)


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = None
    if len(sys.argv) > 2:
        only = {n.strip() for n in sys.argv[2].split(",") if n.strip()}

    import bench  # noqa: E402  (repo root on path)

    spark = get_spark("plan_capture")
    qs = registry.queries()
    names = [n for n in bench.HEADLINE if n in qs]
    if only:
        names = [n for n in names if n in only]

    OUT_DIR.mkdir(parents=True, exist_ok=True)
    for name in names:
        t0 = time.perf_counter()
        try:
            df = qs[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # capture the failure instead of dying
            plan = f"PLAN CAPTURE FAILED: {type(exc).__name__}: {exc}"
        dt = time.perf_counter() - t0
        out = OUT_DIR / f"{name}_{suffix}.txt"
        out.write_text(
            f"# query: {name}\n# sf_dir: {SF_DIR}\n"
            f"# capture: explain('formatted') of the returned DataFrame\n"
            f"# construction+explain wall: {dt:.2f}s\n\n" + plan + "\n"
        )
        print(f"{name}: {dt:.2f}s -> {out.name}", file=sys.stderr)


if __name__ == "__main__":
    main()
