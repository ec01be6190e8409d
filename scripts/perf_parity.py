"""Port of the reference's only measurement harness, BasicPerformanceTest
(/root/reference/BasicPerformanceTest/Program.cs:49-67): insert 10,000
Friend rows, then read them all back, printing wall-clock timings.

Faithful-to-architecture mapping (BASELINE.md "Reproduction" note):
- The reference loops 10,000 single-row `Insert(new Friend{Name})` calls
  against its embedded page store. Spark's unit of efficient write is a
  batch — single-row inserts each pay a full commit-log transaction, the
  exact asymmetry BASELINE.json's `spark_approach` accepts — so this
  harness inserts the same 10,000 rows through `Table.insert` in batches
  of 5,000, the reference's OWN InsertBulk default
  (Table/TableCollection.cs:1052). Auto-ids are assigned by the table
  sequence (the reference uses Guid auto-id).
- `FindAll()` maps to `Table.find_all()` materialized with a full
  collect (the reference enumerates all documents to a list).

Prints one JSON line: {"insert_10k_s": ..., "find_all_s": ...,
"rows": ..., "batch_size": 5000}. Single-row-loop timing is also
reported for a SMALL sample (100 rows) and extrapolated, so the
asymmetry is measured rather than hand-waved.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iot_database_spark.database import IotDatabase  # noqa: E402
from iot_database_spark.session import get_spark  # noqa: E402

N = 10_000
BATCH = 5_000  # reference InsertBulk default, TableCollection.cs:1052
SINGLE_SAMPLE = 100


def main() -> None:
    spark = get_spark("perf_parity")
    root = tempfile.mkdtemp(prefix="perf_parity_")
    db = IotDatabase("perfdb", root, spark)
    friends = db.tables("friends", "id bigint, name string")

    rows = [{"id": None, "name": f"Friend{i}"} for i in range(N)]
    t0 = time.perf_counter()
    for start in range(0, N, BATCH):
        friends.insert([dict(r) for r in rows[start : start + BATCH]])
    insert_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    got = friends.find_all().collect()
    find_all_s = time.perf_counter() - t0

    # the single-row loop the reference actually runs, sampled small and
    # extrapolated — each insert is a full snapshot-isolated commit here
    single = db.tables("friends_single", "id bigint, name string")
    t0 = time.perf_counter()
    for i in range(SINGLE_SAMPLE):
        single.insert([{"id": None, "name": f"Friend{i}"}])
    single_s = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "insert_10k_s": round(insert_s, 3),
                "find_all_s": round(find_all_s, 3),
                "rows": len(got),
                "batch_size": BATCH,
                "single_row_sample_n": SINGLE_SAMPLE,
                "single_row_sample_s": round(single_s, 3),
                "single_row_extrapolated_10k_s": round(single_s * N / SINGLE_SAMPLE, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
