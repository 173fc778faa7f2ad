"""Training-data curation pipeline — the LLM-pipeline operators composed.

One declarative plan over a document corpus:

1. score every document (quality heuristic, language ID, token counts);
2. drop low-quality documents;
3. exact-dedup the survivors (md5 fingerprint, min-id survivor);
4. emit the curated corpus with its metrics + per-language accounting.

Everything is column expressions + two hash aggregations — the shape that
holds at 100 TB: scoring is map-side, dedup shuffles only (digest, id)
pairs, and the final accounting is a partial-aggregated group-by.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from batch_processing_pipeline_spark.functions.rounding import round4
from batch_processing_pipeline_spark.functions.text_analysis import (
    bpe_ish_token_count,
    doc_fingerprint,
    language_id,
    quality_score,
    whitespace_token_count,
)


def score_documents(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach quality/langid/token metrics to every document (map-side)."""
    t = F.col(text_col)
    return df.withColumns(
        {
            "quality": round4(quality_score(t)),
            "lang_pred": language_id(t),
            "ws_tokens": whitespace_token_count(t),
            "bpe_tokens": bpe_ish_token_count(t),
            "fingerprint": doc_fingerprint(t),
        }
    )


def curate(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.5,
) -> DataFrame:
    """Scored + filtered + exact-deduped corpus.

    Survivor of each duplicate group = min id among QUALIFYING docs.
    Output: one row per surviving document with metrics and the duplicate
    group size.
    """
    scored = score_documents(df, text_col)
    qualified = scored.where(F.col("quality") >= min_quality)
    # ONE pass (round 12 fifth session, guide §2.4 "two operations keyed
    # the same way share one exchange"): the historical groupBy+join-back
    # consumed `qualified` twice, so the whole scoring projection (quality
    # heuristic, language id, token counts, md5 fingerprint — the
    # expensive regex work) ran once under the survivor aggregate and
    # again under the join-back. min-id / group-count over a
    # fingerprint-partitioned window flags the survivor in the same
    # exchange; `text` is projected away before the shuffle.
    w = Window.partitionBy("fingerprint")
    return (
        qualified.select(
            id_col, "fingerprint", "quality", "lang_pred", "ws_tokens", "bpe_tokens"
        )
        .withColumn("_min_id", F.min(id_col).over(w))
        .withColumn("dup_count", F.count(F.lit(1)).over(w))
        .where(F.col(id_col) == F.col("_min_id"))
        .select(
            id_col,
            "fingerprint",
            "dup_count",
            "quality",
            "lang_pred",
            "ws_tokens",
            "bpe_tokens",
        )
    )


def curation_report(curated: DataFrame) -> DataFrame:
    """Per-language accounting of the curated corpus."""
    return curated.groupBy("lang_pred").agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("ws_tokens").alias("total_ws_tokens"),
        F.sum("bpe_tokens").alias("total_bpe_tokens"),
        round4(F.avg("quality")).alias("avg_quality"),
    )
