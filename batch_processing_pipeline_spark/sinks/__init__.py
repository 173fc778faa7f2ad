"""Output sinks: Redis-style key/value publication, MongoDB document upserts."""

from batch_processing_pipeline_spark.sinks.mongodb import (
    mongo_documents,
    publish_documents,
    write_mongodb,
)
from batch_processing_pipeline_spark.sinks.redis import publish_suggestions

__all__ = [
    "mongo_documents",
    "publish_documents",
    "publish_suggestions",
    "write_mongodb",
]
