"""Hourly-layout partition pruning: the §4.2 layout discipline, proven.

At 100 TB the query-log store is laid out ``date=YYYY-MM-DD/hour=HH/``;
Catalyst must prune partitions statically so a 24-hour window touches 24
directories, not the whole history.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_date_hour_layout_prunes_partitions(spark, tmp_path):
    base = str(tmp_path / "logs")
    df = spark.createDataFrame(
        [
            ("2025-06-09", 23, "old query"),
            ("2025-06-10", 0, "q1"),
            ("2025-06-10", 1, "q2"),
        ],
        "date string, hour int, value string",
    )
    df.write.partitionBy("date", "hour").mode("overwrite").parquet(base)

    q = spark.read.parquet(base).where(
        (F.col("date") == "2025-06-10") & (F.col("hour") <= 1)
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    # partition filters present, and the pruned scan reads 2 of 3 partitions
    assert "PartitionFilters: [" in plan
    assert q.count() == 2
    scan_line = [l for l in plan.splitlines() if "FileScan" in l][0]
    assert "old" not in scan_line
