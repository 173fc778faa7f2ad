"""Hourly query-log text source.

The reference reads exactly ONE hourly file per run
(``IncrementalAutocomplete.java:63-65``) even though its README documents a
24-hour window (``README.md:86`` — hazard H7). This source follows the
documented intent: it accepts a single path, a list of paths, or a glob over
the hourly ``YYYY-MM-DD-HH.txt`` layout, and can compute the glob for a
trailing window.

At scale the log layout should be ``date=YYYY-MM-DD/hour=HH/`` partitioned so
Catalyst prunes partitions statically; a flat hourly-file directory still
works via path lists (Spark parallelizes file listing).
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession


def hourly_paths(base: str, end: datetime, hours: int, suffix: str = ".txt") -> list[str]:
    """Paths for the trailing ``hours``-hour window ending at ``end`` (inclusive)."""
    return [
        f"{base.rstrip('/')}/{(end - timedelta(hours=h)):%Y-%m-%d-%H}{suffix}"
        for h in range(hours)
    ]


def read_query_log(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """Read query-log lines (one search query per line) → DataFrame[value: string]."""
    if isinstance(paths, str):
        paths = [paths]
    return spark.read.text(paths)
