"""Custom stateful streaming operator: the IotValue point state machine
over a write stream.

The reference applies each IotValue write to in-memory point state and
fans out per flags (Table/TableCollection.cs:1411-1433 + background loop
Base/BaseDatabase.cs:83-107). The Structured Streaming form keeps the
17-slot state per point guid with applyInPandasWithState: for every
micro-batch of writes, update each guid's slot arrays (latest-ts-wins per
slot) and emit the new effective value — a running, incremental
replay_slots (operators/iotvalue.py) that never rescans history.

State schema:  per-guid arrays of 17 slot values + write timestamps.
Output:        one row per (guid, batch) with the post-batch effective
               value/priority/timestamp — the same columns the batch
               replay produces, so downstream plans are identical.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from iot_database_spark.operators.iotvalue import NUM_SLOTS

STATE_SCHEMA = "values array<string>, ts array<bigint>"
OUTPUT_SCHEMA = (
    "guid string, value string, priority int, ts_us bigint, n_writes bigint"
)


def update_point_state(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    """applyInPandasWithState update function.

    Input rows: (guid string, ts timestamp, priority int, value string).
    Slot update rule: a write lands in its priority slot iff its ts is
    >= the slot's current ts (latest wins — IotValue.SetValue overwrite
    semantics); effective value = first non-null slot 1..16.
    """
    (guid,) = key
    if state.exists:
        values, ts_us = state.get
        values, ts_us = list(values), list(ts_us)
    else:
        values = [None] * NUM_SLOTS
        ts_us = [0] * NUM_SLOTS

    n = 0
    for pdf in pdfs:
        n += len(pdf)
        epoch = pdf["ts"].astype("datetime64[us]").astype("int64")
        for t, p, v in zip(epoch, pdf["priority"], pdf["value"]):
            idx = int(p) - 1
            if 0 <= idx < NUM_SLOTS and t >= ts_us[idx]:
                values[idx] = None if v is None else str(v)
                ts_us[idx] = int(t)

    state.update((values, ts_us))

    eff_value, eff_priority, eff_ts = None, None, None
    for i in range(NUM_SLOTS - 1):  # slots 1..16; 17 is config-only
        if values[i] is not None:
            eff_value, eff_priority, eff_ts = values[i], i + 1, ts_us[i]
            break
    yield pd.DataFrame(
        {
            "guid": [guid],
            "value": [eff_value],
            "priority": [eff_priority],
            "ts_us": [eff_ts],
            "n_writes": [n],
        }
    )


def streaming_effective_value(writes_stream):
    """Wire a (guid, ts, priority, value) stream through the stateful
    operator. Returns a streaming DataFrame of per-guid effective values
    (append mode; one row per guid per micro-batch that touched it)."""
    return (
        writes_stream.groupBy("guid").applyInPandasWithState(
            update_point_state,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
