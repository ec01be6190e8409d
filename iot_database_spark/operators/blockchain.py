"""Hash-chained audit log (reference: Iot.Database/Blockchain/).

Reference semantics:
- hash = SHA256(timestamp + previousHash + data), first block's
  previousHash = "" (Block.CalculateHash — Blockchain/Block.cs:24-39).
- consecutive duplicate data is not re-appended
  (BlockCollection.Insert — BlockCollection.cs:52-68).
- verify recomputes each hash and the prev-hash linkage, reporting the
  first break (VerifyBlockList — BlockCollection.cs:131-155).

Scale design: the reference keeps ONE global chain — inherently
sequential, a non-starter at 100 TB. We chain **per key** (per device
guid): each chain is still sequential internally (the hash recurrence is
irreducible), but chains build in parallel across keys. Both APPEND and
VERIFY are pure JVM plans: append folds each key's sorted block list with
the `aggregate` higher-order function (collect_list -> fold -> posexplode
— no Python workers, no Arrow hops); verify is window lag + sha2.
Per-key chains must fit in one aggregation buffer (~millions of blocks);
beyond that, chain per (key, epoch) and link epoch heads.

Canonical hash input (documented so external verifiers can reproduce):
    sha256( epoch_micros_string || prev_hash || data )
with prev_hash = '' for the first block of a key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from iot_database_spark.functions.time import epoch_us, epoch_us_sql


def dedup_consecutive(
    blocks: DataFrame, key: str = "guid", ts: str = "ts", data: str = "data"
) -> DataFrame:
    """Drop rows whose data equals the previous row's data within a key
    (BlockCollection.Insert dedup, :56-60)."""
    w = W.partitionBy(key).orderBy(ts)
    return (
        blocks.withColumn("_prev_data", F.lag(data).over(w))
        .filter(F.col("_prev_data").isNull() | (F.col(data) != F.col("_prev_data")))
        .drop("_prev_data")
    )


def append_chain(
    blocks: DataFrame, key: str = "guid", ts: str = "ts", data: str = "data"
) -> DataFrame:
    """Compute (prev_hash, hash) for every block, chaining per key.

    Plan: groupBy(key) -> sort_array(collect_list(struct(ts, data, ...)))
    -> `aggregate` fold computing the running sha256 -> posexplode back to
    rows. One shuffle, all codegen'd JVM expressions. Input rows may
    arrive in any order; each key's blocks are ordered by (ts, data).

    hash_i = sha256( epoch_micros || hash_{i-1} || data ), first prev = ''
    (Block.CalculateHash — Blockchain/Block.cs:24-39).
    """
    others = [c for c in blocks.columns if c not in (key, ts, data)]
    item = F.struct(F.col(ts), F.col(data), *[F.col(c) for c in others])
    g = blocks.groupBy(key).agg(
        F.sort_array(F.collect_list(item)).alias("_items")
    )
    # fold left over the sorted blocks, accumulating the hash list; the
    # sha2 expression appears twice because SQL lambdas cannot bind locals
    step_hash = (
        f"sha2(concat(cast({epoch_us_sql(f'x.{ts}')} as string), acc.prev, "
        f"cast(x.{data} as string)), 256)"
    )
    hashes = F.expr(
        f"""
        aggregate(
            _items,
            named_struct('prev', '', 'hs', cast(array() as array<string>)),
            (acc, x) -> named_struct(
                'prev', {step_hash},
                'hs', array_append(acc.hs, {step_hash})),
            acc -> acc.hs
        )
        """
    )
    exploded = g.select(
        key, F.col("_items"), hashes.alias("_hs")
    ).select(
        key,
        "_hs",
        F.posexplode("_items").alias("_pos", "_item"),
    )
    return exploded.select(
        key,
        *[F.col(f"_item.{c}") for c in (ts, data, *others)],
        F.when(F.col("_pos") == 0, F.lit(""))
        .otherwise(F.element_at("_hs", F.col("_pos")))
        .alias("prev_hash"),
        F.element_at("_hs", F.col("_pos") + 1).alias("hash"),
    )


def verify_chain(
    chain: DataFrame, key: str = "guid", ts: str = "ts", data: str = "data"
) -> DataFrame:
    """Recompute hashes + linkage; per key report chain length and the
    first broken position (null when intact). Pure JVM (window lag + sha2)
    — VerifyBlockList semantics (BlockCollection.cs:131-155)."""
    w = W.partitionBy(key).orderBy(ts, data)
    checked = (
        chain.withColumn("_expected_prev", F.coalesce(F.lag("hash").over(w), F.lit("")))
        .withColumn(
            "_recomputed",
            F.sha2(
                F.concat(
                    epoch_us(ts).cast("string"),
                    F.col("prev_hash"),
                    F.col(data).cast("string"),
                ),
                256,
            ),
        )
        .withColumn("_pos", F.row_number().over(w))
        .withColumn(
            "_broken",
            (F.col("prev_hash") != F.col("_expected_prev"))
            | (F.col("hash") != F.col("_recomputed")),
        )
    )
    return checked.groupBy(key).agg(
        F.count("*").alias("n_blocks"),
        F.min(F.when(F.col("_broken"), F.col("_pos"))).alias("first_break"),
        (F.count(F.when(F.col("_broken"), 1)) == 0).alias("valid"),
        F.max_by("hash", "_pos").alias("head_hash"),
    )
