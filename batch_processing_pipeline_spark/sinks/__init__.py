"""Output sinks: Redis-style key/value publication via foreachPartition."""

from batch_processing_pipeline_spark.sinks.redis import publish_suggestions

__all__ = ["publish_suggestions"]
