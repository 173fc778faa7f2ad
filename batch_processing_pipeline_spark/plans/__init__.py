"""End-to-end logical plans (library pipelines built from the operators)."""

from batch_processing_pipeline_spark.plans.autocomplete import (
    autocomplete_batch,
    suggestions,
)

__all__ = ["autocomplete_batch", "suggestions"]
