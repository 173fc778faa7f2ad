"""Point-in-interval (range) join with a bucketed scale path.

The reference engine's surface is equi-join only
(``IncrementalAutocomplete.java:95-118`` joins on exact keys); a range
predicate like ``p.ts BETWEEN i.start AND i.end`` is the classic case Spark
plans badly when expressed naively: with no equi-key, Catalyst falls back to
BroadcastNestedLoopJoin (fine only when one side broadcasts) or a cartesian
product — O(|P|·|I|) at 100 TB, a non-starter.

The scale path here manufactures an equi-key: pick a bucket width ``w``,
explode every interval into the buckets it covers
(``sequence(floor(start/w), floor(end/w))``), bucket each point with
``floor(ts/w)``, and equi-join on the bucket id before applying the exact
range predicate as a post-filter. Each point lands in exactly one bucket and
an interval's covered buckets are distinct, so the join produces no
duplicate (point, interval) pairs — no distinct pass needed.

Cost model: shuffle is |P| + |I|·(avg_span/w) rows, both fixed-width; the
per-bucket fan-out is bounded by choosing w close to the typical interval
span. Skewed buckets (hot hours) are handled by AQE skew-join splitting
since the join is a plain SortMergeJoin/ShuffledHashJoin on a long key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucketed_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """Join ``points`` to ``intervals`` where
    ``start_ts <= point_ts < end_ts`` via bucket equi-join.

    All three columns must be epoch-seconds LONGs (callers convert
    timestamps first — keeping the key integral keeps the bucket arithmetic
    exact and the shuffle rows fixed-width). Intervals are half-open.
    """
    if how != "inner":
        raise ValueError("only inner interval joins are supported")
    w = int(bucket_seconds)
    if w <= 0:
        raise ValueError("bucket_seconds must be positive")
    p = points.withColumn("_bkt", F.floor(F.col(point_ts) / F.lit(w)))
    # end is exclusive: an interval [s, e) covers buckets floor(s/w) ..
    # floor((e-1)/w); sequence() is inclusive on both ends.
    i = intervals.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.floor(F.col(start_ts) / F.lit(w)),
                F.floor((F.col(end_ts) - F.lit(1)) / F.lit(w)),
            )
        ),
    )
    joined = p.join(i, "_bkt").where(
        (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) < F.col(end_ts))
    )
    return joined.drop("_bkt")
