"""Deterministic top-K: tie-breaks (H5) and ordered arrays (H4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from batch_processing_pipeline_spark.operators.topk import ordered_collect, top_k_per_group


def test_topk_tiebreak_deterministic(spark):
    rows = [("p", "b", 5), ("p", "a", 5), ("p", "c", 9), ("p", "d", 1)]
    df = spark.createDataFrame(rows, "prefix string, query string, frequency long")
    got = top_k_per_group(
        df, ["prefix"], [F.desc("frequency"), F.asc("query")], k=3
    ).orderBy("rk")
    assert [(r.rk, r.query) for r in got.collect()] == [(1, "c"), (2, "a"), (3, "b")]


def test_ordered_collect_is_rank_ordered(spark):
    rows = [("p", 3, "c"), ("p", 1, "a"), ("p", 2, "b"), ("q", 1, "z")]
    df = spark.createDataFrame(rows, "prefix string, rk int, query string")
    # repartition adversarially so shuffle order != rank order
    got = {
        r.prefix: r.completions
        for r in ordered_collect(df.repartition(7), ["prefix"], "rk", "query").collect()
    }
    assert got["p"] == ["a", "b", "c"]
    assert got["q"] == ["z"]


def test_topk_uses_window_group_limit(spark):
    """Spark ≥3.5 must plan WindowGroupLimit (two-phase top-K) below the
    shuffle — the physical shape that survives Zipf-skewed groups at scale."""
    df = spark.range(1000).select(
        (F.col("id") % 10).alias("g"), F.col("id").alias("v")
    )
    plan = (
        top_k_per_group(df, ["g"], [F.desc("v"), F.asc("v")], k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan
