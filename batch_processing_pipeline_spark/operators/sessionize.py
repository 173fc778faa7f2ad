"""Gap-based sessionization (batch twin of ``F.session_window``).

Classic lag + cumulative-sum formulation: a new session starts when the gap
to the previous event (per user) exceeds ``gap_seconds``; the running sum of
session-start flags is the session id. Streaming twin lives in
``streaming/`` (``F.session_window(ts, gap)``).

Everything is window functions over ``(user, ts)`` — one shuffle on the user
key, no Python. At scale the input should already be partitioned by the user
key so the window reuses the layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    gap_seconds: int = 1800,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign a per-user 1-based ``session_col`` to each event row."""
    order = [F.col(ts_col).asc(), F.col(tiebreak_col).asc()]
    w = Window.partitionBy(user_col).orderBy(*order)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    # unix_timestamp truncates to whole seconds — keep that contract stable
    # (the DuckDB oracle uses floor(epoch(ts)) to match).
    gap = F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts)
    new_session = F.when(
        prev_ts.isNull() | (gap > F.lit(gap_seconds)), F.lit(1)
    ).otherwise(F.lit(0))
    run = Window.partitionBy(user_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(session_col, F.sum(new_session).over(run))
