"""Scalar/column function surface: vector math, text analysis."""

from batch_processing_pipeline_spark.functions.vector import (
    dot_product,
    l2_norm,
    cosine_similarity,
)
from batch_processing_pipeline_spark.functions.text_analysis import (
    tokens,
    whitespace_token_count,
    bpe_ish_token_count,
    punct_ratio,
    stopword_ratio,
    quality_score,
    language_id,
    doc_fingerprint,
    char_shingles,
)

__all__ = [
    "dot_product",
    "l2_norm",
    "cosine_similarity",
    "tokens",
    "whitespace_token_count",
    "bpe_ish_token_count",
    "punct_ratio",
    "stopword_ratio",
    "quality_score",
    "language_id",
    "doc_fingerprint",
    "char_shingles",
]
