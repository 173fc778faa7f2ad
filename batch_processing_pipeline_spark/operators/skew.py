"""Skew mitigation: salted two-phase aggregation.

At 100 TB the prefix distribution is Zipfian — a single hot key ("th…")
lands every row on one reducer. AQE's skew handling covers joins but not
aggregations with a single giant group; the classic fix is salting: append
a random-ish salt to the key, partially aggregate (key, salt), then
aggregate again on the key alone. Both aggregations combine map-side, so
the hot key's traffic is split across ``salt_buckets`` reducers in phase 1
and only ``salt_buckets`` pre-aggregated rows reach the phase-2 reducer.

The salt is derived from a hash of the whole row's spark partition + a
monotonic id — deterministic per run, uniform, and requiring no RNG (keeps
plans replayable).

Only algebraic aggregates (sum/count/min/max) decompose this way; use
two-level sketches for avg (sum+count) — provided as ``salted_avg``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _with_salt(df: DataFrame, salt_buckets: int) -> DataFrame:
    return df.withColumn(
        "_salt", F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(salt_buckets))
    )


def salted_sum(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    out_col: str | None = None,
    salt_buckets: int = 16,
) -> DataFrame:
    """groupBy(group_cols).sum(value_col), skew-safe."""
    out_col = out_col or f"sum_{value_col}"
    partial = (
        _with_salt(df, salt_buckets)
        .groupBy(*group_cols, "_salt")
        .agg(F.sum(value_col).alias("_partial"))
    )
    return partial.groupBy(*group_cols).agg(F.sum("_partial").alias(out_col))


def salted_count(
    df: DataFrame,
    group_cols: Sequence[str],
    out_col: str = "n",
    salt_buckets: int = 16,
) -> DataFrame:
    partial = (
        _with_salt(df, salt_buckets)
        .groupBy(*group_cols, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
    )
    return partial.groupBy(*group_cols).agg(F.sum("_partial").cast("long").alias(out_col))


def salted_avg(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    out_col: str | None = None,
    salt_buckets: int = 16,
) -> DataFrame:
    """Average decomposed as (sum, count) pairs through the salt level."""
    out_col = out_col or f"avg_{value_col}"
    partial = (
        _with_salt(df, salt_buckets)
        .groupBy(*group_cols, "_salt")
        .agg(
            F.sum(value_col).alias("_s"),
            F.count(value_col).alias("_c"),
        )
    )
    return partial.groupBy(*group_cols).agg(
        (F.sum("_s") / F.sum("_c")).alias(out_col)
    )