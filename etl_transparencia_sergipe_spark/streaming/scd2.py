"""Streaming SCD type-2 maintenance (§2.10/§2.11 custom stateful op).

The streaming twin of the batch q88 interval build
(plans/event_analytics.py): per user, track the current attribute run
(event_type) in ``applyInPandasWithState`` state; when a batch shows the
attribute changed, CLOSE the open interval and emit it — the exact row a
warehouse MERGE would flip from current to historical. Open runs live in
state (one fixed-size tuple per key), never in output, so emitted rows
are append-only and idempotent downstream.

Ordering contract: rows must arrive per-key in (ts, event_id) order
across micro-batches (in-batch order is enforced here with a sort). A
replayed log or a per-key-ordered source satisfies it; an out-of-order
production stream needs a watermark-sorted pre-stage first.

Non-null contract: ``event_type`` must be non-null. The batch twin's
NULL-safe lag comparison (NULL <> x is NULL -> no change flag) merges a
NULL row into the prior run and q88's MIN() picks the non-null label,
while numpy's ``!=`` would treat None as its own run — rather than
replicate that corner, the stream requires the attribute column be
cleaned upstream (the fixture and any real change log satisfy this; a
NULL attribute in a change log is a data-quality error — see
operators/dq.py check_not_null).

Scale posture: state is (type, valid_from, n, version) per key — fixed
width, no growth with history; per-batch work is a vectorized
change-point segmentation (shift-compare + cumsum) with a Python loop
only over RUNS, not events. Stream ≡ batch is the test oracle
(tests/test_scd2_stream.py), including a two-batch split that exercises
cross-batch run stitching.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = ("user_id bigint, version bigint, event_type string, "
                 "valid_from string, valid_to string, n_events bigint")
# open-run state: current attribute value, run start (us since epoch),
# events in run, 1-based version counter
STATE_SCHEMA = "cur_type string, vf_us bigint, n bigint, ver bigint"

_FMT = "%Y-%m-%d %H:%M:%S"


def _fmt_us(us: int) -> str:
    return pd.Timestamp(us, unit="us").strftime(_FMT)


def _scd2_update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    (user_id,) = key
    pdf = pd.concat(list(pdfs), ignore_index=True)
    if len(pdf) == 0:
        return
    pdf = pdf.sort_values(["ts", "event_id"], ignore_index=True)
    types = pdf["event_type"].to_numpy()
    ts_us = (pdf["ts"].astype("datetime64[us]").to_numpy()
             .astype("int64"))

    cur_type, vf_us, n, ver = (state.get if state.exists
                               else (None, 0, 0, 0))
    # vectorized change points within the batch; run r spans
    # [starts[r], starts[r+1]) in row index space
    import numpy as np

    chg = np.empty(len(types), dtype=bool)
    chg[0] = True
    chg[1:] = types[1:] != types[:-1]
    starts = np.flatnonzero(chg)
    ends = np.append(starts[1:], len(types))

    out = {"user_id": [], "version": [], "event_type": [],
           "valid_from": [], "valid_to": [], "n_events": []}
    for s, e in zip(starts, ends):
        t = types[s]
        if cur_type is not None and t == cur_type:
            n += int(e - s)  # batch head extends the open run
            continue
        if cur_type is not None:
            # attribute changed at ts_us[s]: close the open run
            out["user_id"].append(user_id)
            out["version"].append(ver)
            out["event_type"].append(cur_type)
            out["valid_from"].append(_fmt_us(vf_us))
            out["valid_to"].append(_fmt_us(int(ts_us[s])))
            out["n_events"].append(n)
        cur_type, vf_us, n, ver = t, int(ts_us[s]), int(e - s), ver + 1
    state.update((cur_type, vf_us, n, ver))
    if out["user_id"]:
        yield pd.DataFrame(out)


def scd2_stream(events: DataFrame) -> DataFrame:
    """Closed SCD2 intervals as an append stream (open runs stay in
    state; batch twin: q88 rows with non-null valid_to).

    Ordering contract: events are sorted (ts, event_id) WITHIN each
    micro-batch, but runs segment in ARRIVAL order across batches — the
    operator does not reorder event time across batch boundaries (no
    watermark buffer; a keyed, time-ordered source like a per-user Kafka
    partition or time-ranged file batches satisfies the contract, and
    the stream ≡ batch q88 parity test feeds exactly that). Feeding
    randomly-sharded batches yields a segmentation of the arrival order,
    which is well-defined but not equal to the event-time segmentation.
    """
    return (
        events.select("user_id", "event_type", "ts", "event_id")
        .groupBy("user_id")
        .applyInPandasWithState(
            _scd2_update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
