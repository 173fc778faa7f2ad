"""Cost-based-optimizer statistics and exchange reuse — two more Catalyst
mechanisms the engine leans on at scale, pinned so conf/shape drift is
caught by CI:

- ANALYZE TABLE gives the planner real row counts/sizes; a join against a
  small ANALYZED table must flip to broadcast without any manual hint.
- When one aggregated subplan feeds two consumers, the shuffle must be
  planned once and reused (ReusedExchange), not recomputed.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_cbo_column_stats_flip_filtered_dim_to_broadcast(spark, tmp_path):
    """Anti-vacuity by construction: the dim's ON-DISK size exceeds the
    broadcast threshold, so WITHOUT CBO the filtered dim keeps its
    file-size estimate and the join stays sort-merge; WITH cbo.enabled +
    ANALYZE FOR COLUMNS the equality filter's selectivity (1/ndv) shrinks
    the estimate under the threshold and the same query flips to
    broadcast. Both arms asserted, so neither a stats regression nor a
    trivially-small fixture can fake the pass."""
    spark.sql("DROP TABLE IF EXISTS cbo_dim")
    spark.range(0, 60000).select(
        F.col("id").alias("k"),
        (F.col("id") % 100).alias("bucket"),
        F.md5(F.col("id").cast("string")).alias("pad1"),
        F.md5((F.col("id") + 1).cast("string")).alias("pad2"),
        F.md5((F.col("id") + 2).cast("string")).alias("pad3"),
    ).write.mode("overwrite").option("path", str(tmp_path / "dim")).saveAsTable(
        "cbo_dim"
    )
    spark.sql("ANALYZE TABLE cbo_dim COMPUTE STATISTICS")
    spark.sql("ANALYZE TABLE cbo_dim COMPUTE STATISTICS FOR COLUMNS bucket")
    fact = spark.range(0, 100000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )

    def plan_for(cbo: bool) -> str:
        spark.conf.set("spark.sql.cbo.enabled", str(cbo).lower())
        dim = spark.table("cbo_dim").where(F.col("bucket") == 5)
        q = fact.join(dim, "k").select("k", "v", "pad1")
        return q._jdf.queryExecution().executedPlan().toString()

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(256 * 1024))
    try:
        assert "BroadcastHashJoin" not in plan_for(False)  # file-size est: too big
        assert "BroadcastHashJoin" in plan_for(True)  # 1/ndv selectivity: fits
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.cbo.enabled")
        spark.sql("DROP TABLE IF EXISTS cbo_dim")


def test_shared_aggregate_exchange_is_reused(spark, sf_dir):
    """Self-join of one aggregate on its own output: the aggregate's
    shuffle must appear once, the second consumer reading a ReusedExchange.
    (AQE names it ReusedExchange/ReusedQueryStage depending on version —
    accept either marker.)"""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    agg = li.groupBy("l_suppkey").agg(F.sum("l_quantity").alias("q"))
    a, b = agg.alias("a"), agg.alias("b")
    j = a.join(
        b, F.col("a.l_suppkey") == F.col("b.l_suppkey")
    ).select(F.col("a.l_suppkey"), (F.col("a.q") + F.col("b.q")).alias("qq"))
    j.collect()  # AQE finalizes reuse decisions at execution
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert ("ReusedExchange" in plan) or ("ReusedQueryStage" in plan), plan[:2000]
