"""Streaming deduplication: drop already-seen documents as they arrive.

Two tiers, matching how state must be bounded at 100 TB/day ingest:

* ``dedup_within_watermark`` — Spark-native
  ``dropDuplicatesWithinWatermark`` on the content fingerprint: operator
  state holds only fingerprints YOUNGER than the watermark, so state size
  is rate × watermark horizon, independent of corpus history. Right for
  "the same document re-crawled within hours".
* ``run_dedup_stream`` — cross-ALL-history dedup. Unbounded fingerprint
  keyspace cannot live in operator state (the same reasoning as the
  cumulative autocomplete frequencies, streaming/jobs.py): ``foreachBatch``
  anti-joins each micro-batch against a persistent fingerprint store
  (parquet; at scale a bucketed table co-partitioned on the digest so the
  anti-join plans with a single Exchange of the *batch* side only —
  operators/state_store.py pattern), appends survivors, and appends the
  new fingerprints to the store. Within-batch dups collapse with the same
  deterministic min-id survivor rule as batch ``exact_dedup``.

The fingerprint is md5 of normalized text (functions/text_analysis.py
``doc_fingerprint``) — 16 bytes per historical document ever seen, the
minimum durable state any exact cross-history dedup must carry.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from batch_processing_pipeline_spark.functions.text_analysis import doc_fingerprint


def dedup_within_watermark(
    docs: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    watermark: str = "1 hour",
) -> DataFrame:
    """Bounded-state streaming dedup on the content fingerprint."""
    return (
        docs.withColumn("fingerprint", doc_fingerprint(F.col(text_col)))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )


def _merge_batch(
    batch: DataFrame,
    epoch_id: int,
    store_path: str,
    out_path: str,
    id_col: str,
    text_col: str,
) -> None:
    """Anti-join one micro-batch against the fingerprint store; emit + record
    survivors.

    IDEMPOTENT under foreachBatch's at-least-once replay: both writes are
    ``mode("overwrite")`` into batch-id-keyed partition directories
    (``.../batch=<epoch>/``), so a replayed batch overwrites ITS OWN
    partition instead of appending a second copy, and a half-finished
    attempt (out written, store lost — or vice versa) is fully repaired by
    the rerun. The anti-join reads only partitions with ``batch <
    epoch_id``: a replay must not anti-join against fingerprints its own
    failed attempt already recorded (that would emit an empty batch).
    Partition discovery on the parent directory exposes ``batch`` as a
    column on read.
    """
    spark = batch.sparkSession
    fp = batch.withColumn("fingerprint", doc_fingerprint(F.col(text_col)))
    # within-batch survivor: deterministic min id per fingerprint
    w = Window.partitionBy("fingerprint").orderBy(F.col(id_col).asc())
    fresh = fp.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")
    if os.path.exists(store_path):
        seen = (
            spark.read.parquet(store_path)
            .where(F.col("batch") < F.lit(int(epoch_id)))
            .select("fingerprint")
        )
        fresh = fresh.join(seen, "fingerprint", "left_anti")
    fresh = fresh.persist()
    try:
        fresh.drop("fingerprint").write.mode("overwrite").parquet(
            f"{out_path}/batch={int(epoch_id)}"
        )
        fresh.select("fingerprint").write.mode("overwrite").parquet(
            f"{store_path}/batch={int(epoch_id)}"
        )
    finally:
        fresh.unpersist()


def run_dedup_stream(
    docs: DataFrame,
    store_path: str,
    out_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    available_now: bool = True,
):
    """Cross-history streaming exact dedup via foreachBatch + durable store."""
    writer = (
        docs.writeStream.foreachBatch(
            lambda b, epoch: _merge_batch(b, epoch, store_path, out_path, id_col, text_col)
        )
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
