"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference pipeline distilled:
normalize → prefix fan-out → frequency → deterministic top-K) on sf0.001.
``queries()`` / ``oracle_sql()`` expose the full operator registry — one
entry per implemented operator from SURVEY.md §2.4 plus the LLM-pipeline
extensions — for the driver's DuckDB differential harness.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from batch_processing_pipeline_spark.registry import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return QUERIES["dq28_autocomplete_e2e"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; hash-dependent/approximate ops
    (MinHash/SimHash/LSH) are omitted → driver records rows-only checks."""
    return {name: sql for name, sql in ORACLES.items() if sql is not None}
