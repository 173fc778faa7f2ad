"""Approximate aggregates: HLL++ error bound vs exact."""

from __future__ import annotations

from pyspark.sql import functions as F

from batch_processing_pipeline_spark.registry import QUERIES


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    approx = {
        r.o_orderstatus: r.n_cust_approx
        for r in QUERIES["approx_distinct"](spark, sf_dir).collect()
    }
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    exact = {
        r.o_orderstatus: r.n
        for r in o.groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    for k, n in exact.items():
        assert abs(approx[k] - n) / n < 0.05  # rsd=0.02 → 5% is generous
