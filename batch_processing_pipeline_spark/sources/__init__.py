"""Data sources: text query logs, parquet fixtures, JDBC, Kafka."""

from batch_processing_pipeline_spark.sources.text import read_query_log
from batch_processing_pipeline_spark.sources.jdbc import (
    JdbcConfig,
    read_table,
    upsert_sql,
    write_upsert,
)

__all__ = [
    "read_query_log",
    "JdbcConfig",
    "read_table",
    "upsert_sql",
    "write_upsert",
]
