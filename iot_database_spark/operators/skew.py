"""Skew handling: salted two-stage aggregation.

At 100 TB a handful of hot keys (one chatty device, one dominant
mktsegment) can concentrate a shuffle partition onto one executor. AQE's
skew-join splitting handles joins; for aggregations the classic fix is
SALTING: shuffle on (key, salt) first so the hot key's rows spread over
`salt_buckets` reducers, then merge the partials per key.

Results are identical to the plain groupBy (the oracle checks exactly
that); only the shuffle distribution changes. Use for aggregates with a
decomposable merge (sum/count/min/max — avg via sum+count).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (partial_expr, merge_fn) per supported aggregate
_MERGEABLE = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-stage skew-resistant aggregation.

    aggs: output_name -> (agg_fn, column), e.g.
        {"revenue": ("sum", "price"), "n": ("count", "price")}
    """
    # the salt only shapes the shuffle; any row->bucket assignment yields
    # the same merged result, so a cheap per-row hash is fine
    partial_exprs: list[Column] = []
    merge_exprs: list[Column] = []
    for out, (fn_name, col) in aggs.items():
        partial_fn, merge_fn = _MERGEABLE[fn_name]
        partial_exprs.append(partial_fn(F.col(col)).alias(f"_p_{out}"))
        merge_exprs.append(merge_fn(F.col(f"_p_{out}")).alias(out))
    partial = df.withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets)),
    ).groupBy(*keys, "_salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*merge_exprs)
