"""Adversarial quality-skew probe for token_budget_select (staged r14).

The three-tier prefix decomposition claims BOUNDED windows regardless
of the quality distribution. The adversarial shape for a bucket-keyed
plan is the span family's Zipf cliff transplanted: one quality value
owning ~99% of the corpus, with the budget boundary landing INSIDE
that mega-bucket, so tiers 2-3 must refine a bucket that is
effectively the whole corpus. The design predicts flatness: tier 2
aggregates the mega-bucket by id-range (populations structurally
capped at RANGE_W docs — ranges derive from doc_id, so no data
distribution can skew them), its cumsum window sees n_docs/RANGE_W
rows, and tier 3's exact window sees <= RANGE_W rows.

Usage: python scripts/probe_budget_skew.py [n_docs]
Prints one JSON line per shape: {"shape": ..., "seconds": min-of-2,
"n_selected": ...} plus a final ratio line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from iot_database_spark.operators.staged_r14 import token_budget_select  # noqa: E402
from iot_database_spark.session import get_spark  # noqa: E402


def _force(df) -> int:
    return df.groupBy().agg(F.count(F.lit(1))).collect()[0][0]


def _base(spark, n: int):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.lit(50) + F.col("id") % 200).cast("bigint").alias("n_tokens"),
    )


def _with_budget(d):
    b = d.groupBy().agg(
        F.expr("CAST(SUM(n_tokens) DIV 4 AS BIGINT)").alias("budget")
    )
    return d.crossJoin(F.broadcast(b))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    spark = get_spark("budget-skew-probe")

    shapes = {
        # quality uniform over the 10k domain: boundary bucket holds
        # ~n/10000 docs — the benign shape
        "uniform": (F.col("doc_id") % 10000).cast("bigint"),
        # 99% of docs share ONE quality value; the 1% above it cannot
        # fill a 25% budget, so the boundary lands inside the
        # mega-bucket and tiers 2-3 refine ~0.99n docs
        "hot_bucket": F.when(F.col("doc_id") % 100 == 0, F.lit(9000))
        .otherwise(F.lit(5000))
        .cast("bigint"),
    }

    results: dict[str, float] = {}
    for shape, qcol in shapes.items():
        d = _with_budget(_base(spark, n).withColumn("quality_bp", qcol))
        sel = token_budget_select(d)
        n_sel = _force(sel)  # warm-up
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            _force(token_budget_select(d))
            times.append(time.perf_counter() - t0)
        results[shape] = min(times)
        print(
            json.dumps(
                {"shape": shape, "seconds": round(min(times), 2), "n_selected": n_sel}
            )
        )

    print(
        json.dumps(
            {
                "metric": "hot_over_uniform_ratio",
                "value": round(results["hot_bucket"] / results["uniform"], 2),
                "n_docs": n,
            }
        )
    )


if __name__ == "__main__":
    main()
