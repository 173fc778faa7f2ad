"""Custom Python DataSource for the hourly query-log layout.

The reference reads hourly HDFS files named ``YYYY-MM-DD-HH.txt``
(``README.md:83``, ``upload_to_hdfs.ps1:4-6``) with the 24-hour window
applied by the CALLER listing paths. This source moves that contract into
the planner via Spark 4's Python DataSource API
(``pyspark.sql.datasource``): each hourly file becomes one
``InputPartition`` (parallel reads, executor-side), and ``start_hour`` /
``end_hour`` options prune out-of-range files AT PLANNING TIME — the
partition-pruning behavior a path-glob caller has to hand-roll.

Usage::

    spark.dataSource.register(QueryLogDataSource)
    df = (spark.read.format("querylog")
          .option("path", "/logs")
          .option("start_hour", "2025-01-01-00")   # inclusive, optional
          .option("end_hour", "2025-01-01-23")     # inclusive, optional
          .load())
    # value: string (raw line), hour: string "YYYY-MM-DD-HH"

Scale notes: one partition per hourly file matches the layout's natural
parallelism (the reference's 24-h window = 24 partitions); a Python
worker streams each file line-by-line (no whole-file buffering). For
columnar formats Spark's built-in readers stay the right tool — this API
is for layouts/protocols Spark has no native source for.
"""

from __future__ import annotations

import os
import re

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_HOUR_RE = re.compile(r"^(\d{4}-\d{2}-\d{2}-\d{2})\.txt$")


class HourFilePartition(InputPartition):
    def __init__(self, path: str, hour: str):
        self.path = path
        self.hour = hour


class QueryLogReader(DataSourceReader):
    def __init__(self, options: dict):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("querylog source requires .option('path', <dir>)")
        self.start = options.get("start_hour")
        self.end = options.get("end_hour")

    def partitions(self):
        parts = []
        for name in sorted(os.listdir(self.root)):
            m = _HOUR_RE.match(name)
            if not m:
                continue
            hour = m.group(1)
            # planning-time pruning: out-of-window files never become
            # partitions, so no task is scheduled for them at all.
            # "YYYY-MM-DD-HH" compares correctly as a string.
            if self.start is not None and hour < self.start:
                continue
            if self.end is not None and hour > self.end:
                continue
            parts.append(HourFilePartition(os.path.join(self.root, name), hour))
        return parts

    def read(self, partition: HourFilePartition):
        with open(partition.path, encoding="utf-8") as f:
            for line in f:
                yield (line.rstrip("\n"), partition.hour)


class QueryLogDataSource(DataSource):
    """``format("querylog")`` — hourly query-log files as (value, hour)."""

    @classmethod
    def name(cls) -> str:
        return "querylog"

    def schema(self) -> str:
        return "value string, hour string"

    def reader(self, schema) -> QueryLogReader:
        return QueryLogReader(self.options)
