"""Runtime filters: dynamic partition pruning (DPP) and bloom-filter join
pruning — the two Catalyst mechanisms that cut a 100-TB fact scan using
facts learned from the dim side AT RUNTIME, after static pruning has done
what it can.  Both are conf-gated; these tests pin that the engine's
layout/join shapes actually trigger them, so a conf regression or a join
rewritten off the partition key gets caught here, not at scale.
"""

from __future__ import annotations

import contextlib

from pyspark.sql import functions as F


@contextlib.contextmanager
def _conf(spark, **kv):
    old = {}
    for k, v in kv.items():
        key = k.replace("__", ".")
        try:
            old[key] = spark.conf.get(key)
        except Exception:
            old[key] = None
        spark.conf.set(key, v)
    try:
        yield
    finally:
        for key, v in old.items():
            if v is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, v)


def test_dynamic_partition_pruning_triggers(spark, tmp_path):
    """Fact partitioned by region key, dim filtered selectively → the fact
    scan's PartitionFilters must contain a dynamicpruningexpression: only
    partitions matching the dim's surviving keys are read."""
    base = str(tmp_path / "fact")
    fact = spark.range(0, 1000).select(
        F.col("id").alias("sale_id"),
        (F.col("id") % 5).alias("region_key"),
        (F.col("id") * 2).alias("amount"),
    )
    fact.write.partitionBy("region_key").mode("overwrite").parquet(base)
    dim = spark.createDataFrame(
        [(0, "keep"), (1, "drop"), (2, "drop"), (3, "drop"), (4, "drop")],
        "region_key long, tag string",
    )
    with _conf(
        spark,
        **{
            "spark__sql__optimizer__dynamicPartitionPruning__enabled": "true",
            # the fixture fact is tiny; drop the fallback-filter-ratio gate
            # so size heuristics can't veto DPP in the test
            "spark__sql__optimizer__dynamicPartitionPruning__useStats": "false",
            "spark__sql__optimizer__dynamicPartitionPruning__fallbackFilterRatio": "10",
        },
    ):
        f = spark.read.parquet(base)
        q = f.join(dim.where(F.col("tag") == "keep"), "region_key").select(
            "sale_id", "amount"
        )
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruningexpression" in plan.lower(), plan[:2000]
        assert q.count() == 200  # only region 0 rows


def test_bloom_filter_join_pruning_triggers(spark, tmp_path):
    """Join key is NOT the partition column → DPP can't help, but a bloom
    filter built from the selective dim side is pushed into the fact scan
    (might_contain in the plan) and prunes rows before the shuffle."""
    base = str(tmp_path / "fact2")
    spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("payload")
    ).write.mode("overwrite").parquet(base)
    with _conf(
        spark,
        **{
            "spark__sql__optimizer__runtime__bloomFilter__enabled": "true",
            "spark__sql__optimizer__runtime__bloomFilter__creationSideThreshold": "10MB",
            "spark__sql__optimizer__runtime__bloomFilter__applicationSideScanSizeThreshold": "0",
            # force a shuffle join so the runtime filter has a shuffle to save
            "spark__sql__autoBroadcastJoinThreshold": "-1",
        },
    ):
        fact = spark.read.parquet(base)
        dim = spark.range(0, 5000).select(F.col("id").alias("k")).where(
            F.col("k") % 500 == 0
        )
        q = fact.join(dim, "k").select("k", "payload")
        optimized = (
            q._jdf.queryExecution().optimizedPlan().toString().lower()
        )
        assert "bloomfilter" in optimized or "might_contain" in optimized, (
            optimized[:2000]
        )
        assert q.count() == 10
