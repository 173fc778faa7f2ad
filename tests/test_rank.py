"""operators/rank.py — exact distributed global rank / ntile / top-k.

Differentials against the naive single-partition window forms (which are
the DEFINITION of the semantics), plus the plan-shape invariants the
round-9 fix exists for: one range shuffle, a ReusedExchange between the
rank branch and the counts branch, and no corpus-sized input to any
unpartitioned window.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from batch_processing_pipeline_spark.operators.rank import (
    exact_global_cumagg,
    exact_global_rank,
    global_topk,
    ntile_from_rank,
    rows_before_ntile_bucket,
)


def _fixture(spark, n=997, parts=7):
    # heavy duplication on the order key (97 distinct values over ~1000
    # rows) so ties straddle range boundaries; id is the unique tie-break
    return (
        spark.range(n)
        .repartition(parts)
        .select(
            F.col("id"), (F.hash(F.col("id")) % 97).alias("v")
        )
    )


def test_exact_global_rank_matches_naive_window(spark):
    df = _fixture(spark)
    order = [F.col("v").desc(), F.col("id").asc()]
    got = exact_global_rank(df, order, out_col="r")
    naive = df.withColumn(
        "r", F.row_number().over(Window.orderBy(*order)).cast("long")
    )
    assert got.exceptAll(naive).isEmpty()
    assert naive.exceptAll(got).isEmpty()


def test_exact_global_rank_pins_one_range_shuffle(spark):
    """The counts branch MUST observe the same boundaries and partition-id
    mapping as the rank branch. Round-11 (sf1 fourth decade) showed
    Catalyst exchange reuse is NOT a reliable carrier: column pruning can
    split the branches into two independently-planned range exchanges
    whose AQE shuffle reads coalesce differently (auc_eval's cumulative
    counts jumped backwards at partition seams). The fix pins ONE
    materialized instance via localCheckpoint — the bug class requires a
    second range-exchange instantiation, so the structural assert is:
    NO rangepartitioning survives in the visible plan (the single pinned
    one lives inside the checkpointed lineage, scanned as an RDD)."""
    df = _fixture(spark)
    out = exact_global_rank(df, [F.col("v").asc(), F.col("id").asc()])
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "rangepartitioning" not in plan
    assert "ExistingRDD" in plan


def test_exact_global_rank_empty_and_tiny(spark):
    empty = _fixture(spark).where(F.lit(False))
    assert exact_global_rank(empty, [F.col("id").asc()]).count() == 0
    one = spark.range(1).select("id")
    rows = exact_global_rank(one, [F.col("id").asc()], out_col="r").collect()
    assert [(r.id, r.r) for r in rows] == [(0, 1)]


def test_global_topk_matches_naive_filtered_window(spark):
    df = _fixture(spark)
    order = [F.col("v").desc(), F.col("id").asc()]
    got = global_topk(df, order, k=25, rank_col="rk")
    naive = (
        df.withColumn("rk", F.row_number().over(Window.orderBy(*order)))
        .where(F.col("rk") <= 25)
    )
    assert got.exceptAll(naive).isEmpty()
    assert naive.exceptAll(got).isEmpty()


def test_global_topk_k_larger_than_input(spark):
    df = spark.range(5).select("id")
    got = global_topk(df, [F.col("id").desc()], k=50, rank_col="rk")
    assert [(r.id, r.rk) for r in got.orderBy("rk").collect()] == [
        (4, 1), (3, 2), (2, 3), (1, 4), (0, 5),
    ]


@pytest.mark.parametrize("n", [1, 3, 4, 7, 8, 100, 101, 997])
@pytest.mark.parametrize("k", [3, 4])
def test_ntile_arithmetic_matches_spark_ntile(spark, n, k):
    df = spark.range(n).select("id")
    w = Window.orderBy("id")
    naive = df.select(
        "id", F.ntile(k).over(w).alias("nt"), F.row_number().over(w).alias("r")
    )
    got = naive.select(
        "id",
        "nt",
        ntile_from_rank(F.col("r"), F.lit(n), k).alias("nt2"),
        (F.col("r") - rows_before_ntile_bucket(F.col("nt"), F.lit(n), k)).alias(
            "rn_in"
        ),
        F.row_number()
        .over(Window.partitionBy(F.ntile(k).over(w)).orderBy("id"))
        .alias("rn_naive"),
    )
    bad = got.where(
        (F.col("nt") != F.col("nt2")) | (F.col("rn_in") != F.col("rn_naive"))
    )
    assert bad.count() == 0


def test_exact_global_cumagg_matches_naive_window(spark):
    df = _fixture(spark).select(
        "id", "v", (F.col("id") % 13).cast("long").alias("m")
    )
    order = [F.col("v").asc(), F.col("id").asc()]
    got = exact_global_cumagg(
        df,
        order,
        [("cs", "m", "sum"), ("cm", "m", "max"), ("cn", "m", "min")],
    )
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    naive = df.select(
        "id",
        "v",
        "m",
        F.sum("m").over(w).alias("cs"),
        F.max("m").over(w).alias("cm"),
        F.min("m").over(w).alias("cn"),
    )
    cols = ["id", "v", "m", "cs", "cm", "cn"]
    assert got.select(cols).exceptAll(naive.select(cols)).isEmpty()
    assert naive.select(cols).exceptAll(got.select(cols)).isEmpty()


def test_exact_global_cumagg_exclusive_matches_naive(spark):
    df = _fixture(spark).select(
        "id", "v", (F.col("id") % 13).cast("long").alias("m")
    )
    order = [F.col("v").desc(), F.col("id").asc()]
    got = exact_global_cumagg(
        df, order, [("cs", "m", "sum"), ("cm", "m", "max")], inclusive=False
    )
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, -1)
    naive = df.select(
        "id",
        "v",
        "m",
        F.sum("m").over(w).alias("cs"),
        F.max("m").over(w).alias("cm"),
    )
    cols = ["id", "v", "m", "cs", "cm"]
    assert got.select(cols).exceptAll(naive.select(cols)).isEmpty()
    assert naive.select(cols).exceptAll(got.select(cols)).isEmpty()
    # the global first row must be NULL under the exclusive frame
    first = got.orderBy(F.col("v").desc(), F.col("id").asc()).limit(1).collect()[0]
    assert first.cs is None and first.cm is None


def test_exact_global_cumagg_empty_and_bad_op(spark):
    df = _fixture(spark).where(F.lit(False)).select(
        "id", "v", F.col("id").alias("m")
    )
    assert exact_global_cumagg(df, [F.col("id").asc()], [("c", "m", "sum")]).count() == 0
    with pytest.raises(ValueError):
        exact_global_cumagg(df, [F.col("id").asc()], [("c", "m", "avg")])


def test_exact_global_cumagg_pins_one_range_shuffle(spark):
    """Same pinned-instance invariant as exact_global_rank — and cumagg is
    the operator that CAUGHT the old design's fragility at sf1 (auc_eval).
    Structural assert: zero visible range exchanges (single checkpointed
    instance), plus a wide-relation differential in the auc_eval shape —
    an AGGREGATE input carrying a column the totals branch prunes — against
    the naive running-sum window."""
    df = _fixture(spark).select("id", "v", (F.col("id") % 13).alias("m"))
    out = exact_global_cumagg(
        df, [F.col("v").asc(), F.col("id").asc()], [("cs", "m", "sum")]
    )
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "rangepartitioning" not in plan
    assert "ExistingRDD" in plan


def test_exact_global_cumagg_wide_aggregate_input_matches_window(spark):
    """The auc_eval shape end-to-end: per-key aggregate with an EXTRA
    aggregated column (pruned by the totals branch — the exact divergence
    that produced two independently-coalesced range exchanges pre-fix),
    cumulative count compared row-for-row against the sequential window."""
    base = spark.range(0, 200_000).select(
        (F.col("id") % 61_129).cast("double").alias("s"),
        (F.col("id") % 7).alias("y"),
    )
    per_s = base.groupBy("s").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("y").alias("pos")
    )
    got = exact_global_cumagg(per_s, [F.col("s").asc()], [("ccnt", "cnt", "sum")])
    naive = per_s.withColumn(
        "ccnt",
        F.sum("cnt").over(
            Window.orderBy(F.col("s").asc()).rowsBetween(
                Window.unboundedPreceding, 0
            )
        ),
    )
    assert got.exceptAll(naive).isEmpty()
    assert naive.exceptAll(got).isEmpty()


def test_exact_global_rank_extreme_skew(spark):
    """90% of rows share ONE order-key value: the range partitioner must
    still balance by splitting ties across boundaries on the unique
    tie-break, and the ranks must stay exact."""
    df = spark.range(2000).select(
        "id", F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id")).alias("v")
    ).repartition(8)
    got = exact_global_rank(df, [F.col("v").asc(), F.col("id").asc()], out_col="r")
    naive = df.withColumn(
        "r",
        F.row_number()
        .over(Window.orderBy(F.col("v").asc(), F.col("id").asc()))
        .cast("long"),
    )
    assert got.exceptAll(naive).isEmpty()
    assert naive.exceptAll(got).isEmpty()


def test_exact_global_rank_ten_million_smoke(spark):
    """Scale smoke: 10M rows, rank over the identity order == id + 1 —
    verified by an aggregate identity (sum of |r - id - 1| == 0), no
    driver-side collect of the relation."""
    df = spark.range(10_000_000).repartition(32)
    got = exact_global_rank(df, [F.col("id").asc()], out_col="r")
    bad = got.agg(
        F.sum(F.abs(F.col("r") - F.col("id") - 1)).alias("err"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert bad.n == 10_000_000 and bad.err == 0


def test_exact_global_rank_overflow_guard_raises(spark, monkeypatch):
    """The 33-bit record-number invariant fails LOUDLY, not silently: with
    the guard threshold patched down (2^33 rows is not a fixture), any
    range partition at/over the limit must abort the job via raise_error.
    The threshold is read at call time, so the patch exercises the real
    guard expression."""
    from batch_processing_pipeline_spark.operators import rank as rank_mod

    monkeypatch.setattr(rank_mod, "_MAX_PART_ROWS", 10)
    df = spark.range(50).select("id", F.lit(1).alias("v"))
    out = rank_mod.exact_global_rank(
        df, [F.col("id").asc()], out_col="r", num_partitions=2
    )
    with pytest.raises(Exception, match="2\\^33"):
        out.collect()


def test_exact_global_rank_guard_passes_under_limit(spark, monkeypatch):
    """Same patched threshold, partitions under it: results unchanged —
    the guard is observation-only on the happy path."""
    from batch_processing_pipeline_spark.operators import rank as rank_mod

    monkeypatch.setattr(rank_mod, "_MAX_PART_ROWS", 1000)
    df = spark.range(50).select("id")
    out = rank_mod.exact_global_rank(
        df, [F.col("id").asc()], out_col="r", num_partitions=4
    )
    assert out.agg(F.sum(F.abs(F.col("r") - F.col("id") - 1))).collect()[0][0] == 0


def test_exact_global_ntile_matches_spark_ntile(spark):
    """Direct differential for the packaged helper (the two registry
    users are oracle-checked, but the helper's own contract — bucket AND
    optional rank output — deserves a pin): identical rows to Spark's
    NTILE + row_number over the same total order."""
    from batch_processing_pipeline_spark.operators.rank import exact_global_ntile

    df = _fixture(spark, 503, 5)
    order = [F.col("v").asc(), F.col("id").asc()]
    got = exact_global_ntile(df, order, 7, out_col="nt", rank_col="r")
    w = Window.orderBy(*order)
    naive = df.select(
        "id",
        "v",
        F.row_number().over(w).cast("long").alias("r"),
        F.ntile(7).over(w).alias("nt"),
    )
    assert got.select("id", "v", "r", "nt").exceptAll(naive).isEmpty()
    assert naive.exceptAll(got.select("id", "v", "r", "nt")).isEmpty()
    # rank_col omitted -> bucket only, no stray helper columns
    slim = exact_global_ntile(df, order, 7, out_col="nt")
    assert set(slim.columns) == {"id", "v", "nt"}


def test_adaptive_range_partitions_ignores_inflated_root_estimates(spark):
    """Round-12 optimization regression pin: `_adaptive_range_partitions`
    must size from the plan's LEAF relations, never the optimized root
    estimate — a cross-join projection's root estimate is fabricated
    (observed 265 GB over a 780 KB parquet leaf in hybrid_rrf_search,
    which pinned a 3960-partition range shuffle under 2000 rows). A
    small-leaf plan, however inflated its root estimate, must return
    None (session floor); a stat-less leaf (checkpointed RDD scan
    reports defaultSizeInBytes) must also return None."""
    from batch_processing_pipeline_spark.operators import rank as rank_mod

    small = spark.range(2000).select(F.col("id"), F.lit("x" * 64).alias("t"))
    blown = small.crossJoin(
        spark.range(1).select(F.lit("q").alias("qq"))
    ).select("id", "t", "qq")
    # root estimate of the cross-join product is inflated; leaves are tiny
    assert rank_mod._adaptive_range_partitions(blown) is None
    # a checkpointed leaf has no honest stats -> bail, never divide a
    # Long.MaxValue sentinel into a partition count
    pinned = spark.range(64).localCheckpoint(eager=True)
    assert rank_mod._adaptive_range_partitions(pinned) is None
