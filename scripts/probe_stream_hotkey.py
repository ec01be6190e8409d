"""Hot-key probe for the stateful streaming family (r12 verdict task #3).

The span family's skew cliff came from ONE Zipf-hot key concentrating a
corpus-wide operation; the streaming analog is a fleet-scale BOT key —
one user_id owning a large share of the event stream — hitting the
per-key stateful operators:

- `stream_threshold_alerts` routes through applyInPandasWithState,
  which hands one GROUP's whole micro-batch to one python worker. The
  r12 updater pd.concat'ed that group (hot key = one giant pandas frame
  in one worker's memory); the r13 updater filters each Arrow chunk to
  its EXTREME samples (dead-band rows are state-invariant) before
  buffering and detects transitions vectorized. Both forms are run here
  (the old one reconstructed locally) so the fix is measured, not
  asserted.
- `stream_sessionization` uses native session_window state merging: a
  hot user's events all shuffle into one state partition and merge into
  one mega-session. Optionally A/B's Spark's local partial session
  merge (spark.sql.streaming.sessionWindow.merge.sessions.in.local
  .partition) which combines per-input-partition sessions BEFORE the
  shuffle.

Corpora (written under .scale/streamskew/, gitignored; deterministic):
- `hot`: N events, every 3rd belongs to user 7 (one key = 1/3 of the
  stream, densely spaced -> one giant merged session); the rest spread
  over ~30k users.
- `uniform`: same N events spread evenly over ~30k users.

Values cycle through raise (>=200) / dead-band / clear (<=100) so the
alert path does real transition work. Run alone on a quiet window and
take min-of-two; prints one JSON line.

Usage: python scripts/probe_stream_hotkey.py [n_events] [--local-merge]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

ROOT = Path(__file__).resolve().parent.parent / ".scale" / "streamskew"
_ROW_GROUP_BYTES = 16 * 1024 * 1024


def gen(spark, name: str, hot: bool, n_events: int) -> str:
    out = ROOT / name
    if (out / "events.parquet").exists():
        return str(out)
    out.mkdir(parents=True, exist_ok=True)
    base = spark.range(n_events)
    uid = (F.col("id") % 30011 + 10).cast("bigint")
    if hot:
        uid = F.when(F.col("id") % 3 == 0, F.lit(7).cast("bigint")).otherwise(
            uid
        )
    df = base.select(
        F.col("id").cast("bigint").alias("event_id"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id"))
        .cast("timestamp_ntz")
        .alias("ts"),
        uid.alias("user_id"),
        F.lit("view").alias("event_type"),
        ((F.col("id") * 37) % 300).cast("double").alias("value"),
        F.lit(None).cast("string").alias("props"),
    )
    tmp = str(out / "_tmp_events")
    (
        df.coalesce(1)
        .write.mode("overwrite")
        .option("parquet.block.size", str(_ROW_GROUP_BYTES))
        .parquet(tmp)
    )
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))
    assert len(part) == 1, part
    shutil.move(part[0], str(out / "events.parquet"))
    shutil.rmtree(tmp)
    return str(out)


def old_concat_alert_updater(high: float, low: float):
    """The r12 form, reconstructed for the A/B: pd.concat over the whole
    group + per-row python loop."""
    import pandas as pd

    def update(key, pdfs, state):
        (guid,) = key
        cur = int(state.get[0]) if state.exists else 0
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["ts", "event_id"], kind="mergesort")
        epoch = batch["ts"].astype("datetime64[us]").astype("int64")
        out_ts, out_v, out_a = [], [], []
        for t, v in zip(epoch, batch["value"]):
            v = float(v)
            nxt = 1 if v >= high else (0 if v <= low else cur)
            if nxt != cur:
                out_ts.append(int(t))
                out_v.append(v)
                out_a.append("raise" if nxt == 1 else "clear")
            cur = nxt
        state.update((cur,))
        yield pd.DataFrame(
            {
                "guid": [int(guid)] * len(out_ts),
                "ts_us": out_ts,
                "value": out_v,
                "alert": out_a,
            }
        )

    return update


def time_query(fn, *args) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        fn(*args).collect()
        best = min(best, time.time() - t0)
    return round(best, 2)


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 6_000_000
    local_merge = "--local-merge" in sys.argv

    from iot_database_spark import registry
    from iot_database_spark.operators import streaming_queries as sq
    from iot_database_spark.session import get_spark
    from iot_database_spark.streaming import stateful

    spark = get_spark("probe-stream-hotkey")
    if local_merge:
        clone = sq._stream_session(spark)
        clone.conf.set(
            "spark.sql.streaming.sessionWindow.merge.sessions."
            "in.local.partition",
            "true",
        )
    dirs = {
        "hot": gen(spark, "hot", True, n_events),
        "uniform": gen(spark, "uniform", False, n_events),
    }
    qs = registry.queries()
    result: dict = {
        "probe": "stream_hotkey",
        "n_events": n_events,
        "local_merge": local_merge,
    }
    qs["stream_threshold_alerts"](spark, dirs["uniform"]).collect()  # warm
    for name in ("stream_threshold_alerts", "stream_sessionization"):
        for shape, d in dirs.items():
            result[f"{name}.{shape}"] = time_query(qs[name], spark, d)
    # old concat updater, hot corpus only (the measured cliff)
    import iot_database_spark.streaming.stateful as st

    orig = st.make_alert_updater
    st.make_alert_updater = old_concat_alert_updater
    try:
        for shape, d in dirs.items():
            result[f"alerts_concat_form.{shape}"] = time_query(
                qs["stream_threshold_alerts"], spark, d
            )
    finally:
        st.make_alert_updater = orig
    sq.cleanup_stream_sinks(spark)
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
