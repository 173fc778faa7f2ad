"""Custom stateful streaming operator via ``applyInPandasWithState``.

Running per-key counters/aggregates that must survive across micro-batches
but are too custom for the built-in windowed aggregations — here: a
running (count, sum, max-value-so-far) per key with an inactivity TTL.
This is the pattern slot for any bespoke online state machine (per-user
rate stats, anomaly baselines, dedup-seen sets bounded by TTL).

State layout is one tuple per key — Structured Streaming shards state by
key across partitions, so the operator scales horizontally; the TTL bounds
state size against unbounded key spaces.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "key string, n bigint, total double, peak double"
STATE_SCHEMA = "n bigint, total double, peak double"


def _make_update(ttl_ms: int | None):
    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        n, total, peak = state.get if state.exists else (0, 0.0, float("-inf"))
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            if len(pdf):
                peak = max(peak, float(pdf["value"].max()))
        state.update((n, total, peak))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(
            {"key": [key[0]], "n": [n], "total": [total], "peak": [peak]}
        )

    return update


def running_key_stats(
    events: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming running stats per key; emits the updated row each batch.

    ``ttl_ms`` enables a processing-time inactivity TTL that evicts idle
    keys — use it for continuous (processing-time-triggered) jobs against
    unbounded key spaces. Leave it None for ``availableNow`` / catch-up
    runs: a ProcessingTimeTimeout keeps the query alive waiting for timers,
    so an availableNow trigger would never terminate.
    """
    from pyspark.sql import functions as F

    keyed = events.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("double").alias("value"),
    )
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return keyed.groupBy("key").applyInPandasWithState(
        _make_update(ttl_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
