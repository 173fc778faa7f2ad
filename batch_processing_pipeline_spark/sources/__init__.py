"""Data sources: text query logs, parquet fixtures, JDBC, Kafka, and a
custom Python DataSource for the hourly-log layout (pyds)."""

from batch_processing_pipeline_spark.sources.text import read_query_log
from batch_processing_pipeline_spark.sources.pyds import QueryLogDataSource
from batch_processing_pipeline_spark.sources.jdbc import (
    JdbcConfig,
    read_table,
    upsert_sql,
    write_upsert,
)

__all__ = [
    "QueryLogDataSource",
    "read_query_log",
    "JdbcConfig",
    "read_table",
    "upsert_sql",
    "write_upsert",
]
