"""Trending autocomplete — the reference's deleted predecessor job.

``TrendingAutocomplete`` (evidence: ``MANIFEST.MF:2``, ``approach 3 cli
instructions.txt:6,43``, ``steps.docx`` "Algorithm Plan") computed
per-batch (non-cumulative) top-K completions per prefix and wrote nested
``{prefix, completions:[{query, frequency}]}`` documents to Kafka/MongoDB.

Streaming form: watermarked tumbling windows over the query-log stream;
each window's closed counts go through the same deterministic top-K the
batch plan uses, via ``foreachBatch`` (window top-K needs a rank over the
finished window — not expressible as a streaming aggregation alone).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from batch_processing_pipeline_spark.operators.prefix import (
    expand_prefixes,
    normalize_queries,
)
from batch_processing_pipeline_spark.operators.topk import (
    ordered_collect,
    top_k_per_group,
)


def windowed_prefix_counts(
    raw_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    text_col: str = "value",
) -> DataFrame:
    """Streaming (window, prefix, query) → count with late-data bound."""
    queries = normalize_queries(
        raw_stream, text_col=text_col, carry_cols=(ts_col,)
    )
    pairs = expand_prefixes(queries, carry_cols=(ts_col,))
    return (
        pairs.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), "prefix", "query")
        .agg(F.count(F.lit(1)).alias("frequency"))
        .select(
            F.col("w.start").alias("ws"), F.col("w.end").alias("we"),
            "prefix", "query", "frequency",
        )
    )


def trending_suggestions(window_counts: DataFrame, k: int = 5) -> DataFrame:
    """Per-(window, prefix) deterministic top-K as nested completions.

    Batch transformation (apply inside ``foreachBatch`` on the appended
    closed-window rows). Output: (ws, we, prefix, completions:
    array<struct<query, frequency>>, completions_json) — the trending-era
    nested document shape (``steps.docx`` "Step 1").
    """
    ranked = top_k_per_group(
        window_counts,
        group_cols=["ws", "we", "prefix"],
        order_by=[F.desc("frequency"), F.asc("query")],
        k=k,
    ).withColumn("item", F.struct(F.col("query"), F.col("frequency")))
    out = ordered_collect(
        ranked,
        group_cols=["ws", "we", "prefix"],
        rank_col="rk",
        value_col="item",
        out_col="completions",
    )
    return out.withColumn("completions_json", F.to_json(F.col("completions")))


def run_trending_stream(
    raw_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "30 minutes",
    k: int = 5,
    available_now: bool = True,
):
    """Append-mode windowed counts → foreachBatch top-K → parquet.

    Append mode emits a window's counts exactly once, when the watermark
    closes it — so each foreachBatch invocation ranks only finished
    windows; re-ranking/overwrite churn never happens.
    """
    counts = windowed_prefix_counts(raw_stream, window, watermark)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        trending_suggestions(batch_df, k=k).write.mode("append").parquet(out_dir)

    return (
        counts.writeStream.foreachBatch(process)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=available_now)
        .start()
    )
