"""Data sources: text query logs, parquet fixtures, JDBC, Kafka."""

from batch_processing_pipeline_spark.sources.text import read_query_log

__all__ = ["read_query_log"]
