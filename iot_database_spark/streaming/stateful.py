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


ALERT_STATE_SCHEMA = "state int"
ALERT_OUTPUT_SCHEMA = "guid bigint, ts_us bigint, value double, alert string"


def make_alert_updater(high: float, low: float):
    """applyInPandasWithState update function for hysteresis threshold
    alerting (the streaming twin of `timeseries.threshold_alerts`): the
    per-guid alert state (0=clear, 1=raised) persists in the state store
    ACROSS micro-batches, each batch's samples replay in (ts, event_id)
    order, and only transitions are emitted. A value >= high raises,
    <= low clears, the dead band carries state — identical semantics to
    the batch window plan, so the two are hash-interchangeable.

    Hot-key memory shape (r12 verdict task #3): applyInPandasWithState
    hands ONE group's micro-batch rows to one python worker, so the r12
    form's pd.concat over the whole group materialized a fleet-scale
    bot key (1e8 events on one guid) as a single pandas frame — the
    streaming analog of the boilerplate span. Hysteresis state depends
    ONLY on the most recent EXTREME sample (>= high or <= low): a
    dead-band row can never change state or emit, so each Arrow chunk
    is filtered to its extremes BEFORE anything is buffered, and only
    the compact (ts, event_id, value) extreme arrays are merged, sorted
    and scanned — vectorized (class-change mask), no per-row python
    loop. scripts/probe_stream_hotkey.py measures both forms under a
    1/3-hot key. Residual worst case: a key whose EXTREME samples alone
    exceed worker memory — truncating those would silently change alert
    semantics, so no cap is applied; the probe documents the bound."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        import numpy as np

        (guid,) = key
        cur = int(state.get[0]) if state.exists else 0
        ts_parts, v_parts, id_parts = [], [], []
        for pdf in pdfs:
            v = pdf["value"].to_numpy(dtype="float64")
            keep = (v >= high) | (v <= low)  # dead band: state-invariant
            if not keep.any():
                continue
            ts_parts.append(
                pdf["ts"]
                .astype("datetime64[us]")
                .astype("int64")
                .to_numpy()[keep]
            )
            v_parts.append(v[keep])
            id_parts.append(pdf["event_id"].to_numpy(dtype="int64")[keep])
        if ts_parts:
            ts = np.concatenate(ts_parts)
            v = np.concatenate(v_parts)
            eid = np.concatenate(id_parts)
            order = np.lexsort((eid, ts))  # ts first, event_id tiebreak
            ts, v = ts[order], v[order]
            # after the dead-band filter, post-sample state == class:
            # 1 iff >= high (raise wins when the bands overlap), else 0
            c = (v[:] >= high).astype("int64")
            prev = np.concatenate(([cur], c[:-1]))
            mask = c != prev
            out_ts, out_v, out_c = ts[mask], v[mask], c[mask]
            cur = int(c[-1])
        else:
            out_ts = out_v = out_c = np.empty(0)
        state.update((cur,))
        yield pd.DataFrame(
            {
                "guid": [int(guid)] * len(out_ts),
                "ts_us": [int(t) for t in out_ts],
                "value": [float(x) for x in out_v],
                "alert": ["raise" if x == 1 else "clear" for x in out_c],
            }
        )

    return update


def streaming_threshold_alerts(samples_stream, high: float, low: float):
    """Stream of (guid bigint, ts timestamp, value double, event_id
    bigint) -> append stream of alert transitions. State per guid is ONE
    int — at 100 TB/day the store holds one integer per live series."""
    return samples_stream.groupBy("guid").applyInPandasWithState(
        make_alert_updater(high, low),
        outputStructType=ALERT_OUTPUT_SCHEMA,
        stateStructType=ALERT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
