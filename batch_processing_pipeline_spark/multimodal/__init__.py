"""Multimodal (image/audio/video) column support."""

from batch_processing_pipeline_spark.multimodal.binary_ops import (
    MEDIA_SCHEMA,
    attach_media,
    media_stats,
    decode_image_batches,
    extract_features,
    resize_images,
    sample_frames,
)

__all__ = [
    "MEDIA_SCHEMA",
    "attach_media",
    "media_stats",
    "decode_image_batches",
    "extract_features",
    "resize_images",
    "sample_frames",
]
