"""Document chunking — split long documents into fixed-width overlapping
chunks, the standard pre-tokenization step in an LLM training pipeline
(long docs exceed the sequence budget; overlap preserves cross-boundary
context).  Complements ``pack_sequences`` (which packs SHORT docs up to a
budget; chunking splits LONG ones down to it).

Pure column arithmetic: chunk starts are ``i·stride`` for
``i = 0 .. floor((len-1)/stride)`` (1-based substr), generated with
``explode(sequence(...))`` — whole-stage codegen, no Python, no UDF.  The
explode fans each document out ~len/stride ×; rows stay narrow because the
chunk TEXT is optionally replaced by its md5 (callers doing downstream
tokenization keep the text; corpus-profiling callers keep the digest).

Scale: embarrassingly parallel, zero shuffle — a map-side transform that
preserves the input partitioning.  At 100 TB the only knob that matters is
input split size (``spark.sql.files.maxPartitionBytes``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    size: int,
    stride: int,
    keep_text: bool = False,
) -> DataFrame:
    """(id, chunk_idx, chunk_start, chunk_len, chunk_md5 [, chunk_text]).

    ``stride < size`` gives overlapping chunks (overlap = size - stride);
    ``stride == size`` is a plain partition.  The last chunk may be shorter
    than ``size``.  Empty/NULL texts produce no chunks.
    """
    if size <= 0 or stride <= 0:
        raise ValueError("size and stride must be positive")
    if stride > size:
        raise ValueError("stride must be <= size (gaps would drop text)")
    t = F.col(text_col)
    n_chunks = F.lit(1) + F.floor((F.length(t) - F.lit(1)) / F.lit(stride))
    chunk = F.col("_t").substr(
        (F.col("chunk_idx") * F.lit(stride) + F.lit(1)).cast("int"), F.lit(size)
    )
    out = (
        df.where(t.isNotNull() & (F.length(t) >= 1))
        .select(
            F.col(id_col),
            t.alias("_t"),
            F.explode(F.sequence(F.lit(0), n_chunks - F.lit(1))).alias("chunk_idx"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_idx"),
            (F.col("chunk_idx") * F.lit(stride) + F.lit(1)).alias("chunk_start"),
            F.length(chunk).cast("long").alias("chunk_len"),
            F.md5(chunk).alias("chunk_md5"),
            *([chunk.alias("chunk_text")] if keep_text else []),
        )
    )
    return out
