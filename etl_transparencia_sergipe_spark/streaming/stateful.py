"""Custom stateful streaming operator (§2.10 / §2.11):
``applyInPandasWithState`` running per-user counters with timeout-based
state expiry — the "custom stateful operator" slot the north star calls
for when windows/dedup built-ins can't express the semantics.

Semantics: per user, maintain (event_count, value_sum, max_value); emit an
updated summary row per micro-batch in which the user appeared. State
expires via processing-time timeout (bounded state at 100 TB: without
expiry, per-key state grows forever).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = ("user_id bigint, n_events bigint, total_value double, "
                 "max_value double")
STATE_SCHEMA = "n bigint, total double, mx double"


def _make_update_fn(with_timeout: bool):
    def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        (user_id,) = key
        if with_timeout and state.hasTimedOut:
            state.remove()
            return
        n, total, mx = state.get if state.exists else (0, 0.0, float("-inf"))
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            mx = max(mx, float(pdf["value"].max()))
        state.update((n, total, mx))
        if with_timeout:
            state.setTimeoutDuration(60 * 60 * 1000)  # 1h idle expiry
        yield pd.DataFrame({
            "user_id": [user_id], "n_events": [n],
            "total_value": [total], "max_value": [mx],
        })

    return update


def running_user_stats(events: DataFrame,
                       expire_state: bool = False) -> DataFrame:
    """Stateful per-user running stats over a stream (update mode).

    ``expire_state=True`` adds a 1h processing-time idle expiry — the
    bounded-state requirement for a 100 TB continuous stream. Leave it
    False for availableNow/batch-drain runs: with a processing-time
    timeout the query keeps scheduling timeout batches and an
    availableNow trigger never terminates.
    """
    timeout = (GroupStateTimeout.ProcessingTimeTimeout if expire_state
               else GroupStateTimeout.NoTimeout)
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _make_update_fn(expire_state),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout,
        )
    )


def user_stats_batch(events: DataFrame) -> DataFrame:
    """Batch twin of :func:`running_user_stats`' FINAL state: the same
    (n_events, total_value, max_value) per user a fully-drained stream
    converges to — the oracle surface for q112 (stream ≡ batch is
    asserted in tests/test_stateful_grouped.py). total_value follows the
    registry's exact-decimal cross-engine sum rule (the stateful
    operator itself accumulates in float — per-key, order-dependent —
    which is why the streaming comparison rounds and the ORACLE
    comparison goes through this builder instead)."""
    from pyspark.sql import functions as F

    from etl_transparencia_sergipe_spark.plans._helpers import dsum

    return events.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        dsum("value").alias("total_value"),
        F.max("value").alias("max_value"),
    )
