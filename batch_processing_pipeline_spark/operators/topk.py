"""Deterministic top-K per group.

Reference (``IncrementalAutocomplete.java:121-127``) ranks with
``row_number() OVER (PARTITION BY prefix ORDER BY frequency DESC)`` and
collapses with an *unordered* ``collect_list`` — two correctness hazards:

* H5: no tie-break → equal-frequency completions get nondeterministic ranks;
* H4: ``collect_list`` order after a shuffle is not guaranteed → completions
  arrays are not rank-ordered.

This module fixes both: ranking always carries a unique secondary sort, and
the list aggregation sorts by rank (``sort_array`` over ``struct(rank, x)``)
before stripping the rank.

Scale notes: Spark ≥ 3.5 plans a ``WindowGroupLimit`` below the shuffle for
``row_number ... WHERE rk <= k`` — i.e. the two-phase top-K (local top-K per
map task, then global) that Zipf-skewed prefix partitions need at 100 TB is
already the physical plan; see ``tests/test_plans.py`` which asserts it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rk",
) -> DataFrame:
    """Keep the top ``k`` rows per group; emits a 1-based ``rank_col``.

    ``order_by`` must end in a unique tie-break (caller contract — asserted
    nowhere cheaper than here, so it is documented instead: pass e.g.
    ``[F.desc("frequency"), F.asc("query")]``).

    Empty ``group_cols`` = GLOBAL top-k: InferWindowGroupLimit does NOT
    fire on an empty partitionSpec (verified on 4.1), so the naive window
    would be a single-partition sort of the whole relation — that case
    delegates to the explicit two-phase ``operators.rank.global_topk``.
    """
    if not group_cols:
        from batch_processing_pipeline_spark.operators.rank import global_topk

        return global_topk(df, order_by, k, rank_col=rank_col)
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).where(F.col(rank_col) <= k)


def ordered_collect(
    df: DataFrame,
    group_cols: Sequence[str],
    rank_col: str,
    value_col: str,
    out_col: str = "completions",
) -> DataFrame:
    """Collapse ranked rows into a rank-ordered array per group (H4 fix).

    ``sort_array(collect_list(struct(rank, value)))`` then strips the rank —
    deterministic regardless of shuffle order.
    """
    pair = F.struct(F.col(rank_col), F.col(value_col))
    return df.groupBy(*group_cols).agg(
        F.transform(
            F.sort_array(F.collect_list(pair)), lambda s: s[value_col]
        ).alias(out_col)
    )
