"""Quiet-host re-measure of the stateful-stream state-store configs
(r11 verdict task #5).

Every r11 number in SCALE_r11.md's 4-config table was taken under
admitted ~10x ambient load spikes, and rocksdb-32 beat the chosen
rocksdb-19 for stream_threshold_alerts there (26.05 vs 30.17 s). This
probe re-runs one config over the three stateful streams at a given
sf_dir so the 4-config table can be rebuilt on a quiet window; if 32
holds quiet, `streaming_queries._BIG_STATE_PARTITIONS` moves.

One CONFIG per process (the state pins are read when the stream
session clone spins up): run it once per config, quiet, back-to-back:

    for cfg in hdfs:8 rocksdb:8 rocksdb:19 rocksdb:32; do
        python scripts/probe_stream_state.py $cfg [sf_dir]
    done

Prints one JSON line per run; min-of-two per query after a warm-up
pass of the first query (JVM + codegen warm).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

QUERIES = (
    "stream_threshold_alerts",
    "stream_sessionization",
    "stream_stream_time_join",
)


def main() -> None:
    cfg = sys.argv[1] if len(sys.argv) > 1 else "default"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scale/sf10"
    if cfg != "default":
        provider, parts = cfg.split(":")
        os.environ["SPARK_GRAFT_STREAM_STATE_PROVIDER"] = (
            "" if provider == "hdfs" else provider
        )
        os.environ["SPARK_GRAFT_STREAM_STATE_PARTITIONS"] = parts

    from iot_database_spark import registry
    from iot_database_spark.session import get_spark

    spark = get_spark("probe-stream-state")
    qs = registry.queries()
    result: dict = {"probe": "stream_state", "config": cfg, "sf_dir": sf_dir}
    qs[QUERIES[0]](spark, sf_dir).collect()  # warm-up
    total = 0.0
    for name in QUERIES:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            qs[name](spark, sf_dir).collect()
            best = min(best, time.time() - t0)
        result[name] = round(best, 2)
        total += best
    result["family_total"] = round(total, 2)
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
