"""Shared synthetic fixtures used by BOTH the bench harness and the plan
tests — one definition so the shape they measure cannot drift apart."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def zipf_prefix_fixture(spark: SparkSession, n: int = 120_000,
                        num_partitions: int | None = None) -> DataFrame:
    """Deliberately Zipf-skewed prefix relation: ONE prefix ('hot') carries
    30% of all rows, the rest spread over ~1000 cold prefixes — the shape
    the flagship's per-prefix top-K hits on real query logs (SURVEY §7.3).
    Deterministic (pure column arithmetic, no RNG)."""
    rng = (spark.range(n, numPartitions=num_partitions)
           if num_partitions else spark.range(n))
    return rng.select(
        F.when(F.col("id") % 10 < 3, F.lit("hot"))
        .otherwise(F.concat(F.lit("p"), (F.col("id") % 997).cast("string")))
        .alias("prefix"),
        F.concat(F.lit("q"), F.col("id").cast("string")).alias("query"),
        (F.col("id") % 1000).cast("long").alias("frequency"),
    )
