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
    word_ngram_counts,
)
from batch_processing_pipeline_spark.functions.pii import scrub_pii, pii_counts
from batch_processing_pipeline_spark.functions.bpe import (
    bpe_encode,
    encode_word,
    learn_bpe_merges,
)

__all__ = [
    "bpe_encode",
    "encode_word",
    "learn_bpe_merges",
    "scrub_pii",
    "pii_counts",
    "word_ngram_counts",
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
