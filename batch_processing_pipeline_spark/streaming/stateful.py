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


# ---------------------------------------------------------------------------
# transformWithStateInPandas — the successor arbitrary-state API
# ---------------------------------------------------------------------------
# Spark 4's StatefulProcessor replaces the single state tuple with typed
# state handles (ValueState/ListState/MapState) + event/processing-time
# timers, and decouples state schema from the update function. The same
# running-stats operator on the new API, so callers can migrate off
# applyInPandasWithState without changing semantics (equivalence asserted
# in tests/test_stateful_streaming.py; the test importorskips on
# google.protobuf — the state server's transport — and the operator needs
# the RocksDB state store provider:
#   spark.sql.streaming.stateStore.providerClass =
#     org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider).


def running_key_stats_tws(
    events: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """``running_key_stats`` on ``transformWithStateInPandas``."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "stats", "n bigint, total double, peak double"
            )

        def handleInputRows(self, key, rows, timerValues):
            if self._state.exists():
                n, total, peak = self._state.get()
            else:
                n, total, peak = 0, 0.0, float("-inf")
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                if len(pdf):
                    peak = max(peak, float(pdf["value"].max()))
            self._state.update((n, total, peak))
            yield pd.DataFrame(
                {"key": [key[0]], "n": [n], "total": [total], "peak": [peak]}
            )

        def close(self) -> None:
            pass

    keyed = events.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("double").alias("value"),
    )
    return keyed.groupBy("key").transformWithStateInPandas(
        RunningStats(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
