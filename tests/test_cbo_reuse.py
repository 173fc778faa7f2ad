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


def test_analyzed_small_table_broadcasts_via_cbo(spark, tmp_path):
    spark.sql("DROP TABLE IF EXISTS cbo_dim")
    spark.sql("DROP TABLE IF EXISTS cbo_fact")
    spark.range(0, 10).select(
        F.col("id").alias("k"), F.lit("x").alias("tag")
    ).write.mode("overwrite").option("path", str(tmp_path / "dim")).saveAsTable(
        "cbo_dim"
    )
    spark.range(0, 10000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    ).write.mode("overwrite").option("path", str(tmp_path / "fact")).saveAsTable(
        "cbo_fact"
    )
    spark.sql("ANALYZE TABLE cbo_dim COMPUTE STATISTICS")
    spark.sql("ANALYZE TABLE cbo_fact COMPUTE STATISTICS")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try:
        q = spark.table("cbo_fact").join(spark.table("cbo_dim"), "k")
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan, plan[:1500]
    finally:
        spark.conf.unset("spark.sql.cbo.enabled")
        spark.sql("DROP TABLE IF EXISTS cbo_dim")
        spark.sql("DROP TABLE IF EXISTS cbo_fact")


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
