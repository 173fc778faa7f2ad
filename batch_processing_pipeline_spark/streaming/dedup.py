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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from batch_processing_pipeline_spark.fsutil import has_committed_batches
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
    if has_committed_batches(batch.sparkSession, store_path):
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


def _merge_batch_near(
    batch: DataFrame,
    epoch_id: int,
    index_path: str,
    out_path: str,
    id_col: str,
    text_col: str,
    shingle_n: int,
    num_perm: int,
    bands: int,
    threshold: float,
) -> None:
    """Near-dup one micro-batch against the durable band index + corpus.

    Same idempotency discipline as ``_merge_batch``: both writes are
    overwrites of batch-id-keyed partitions, and the probe reads only
    ``batch < epoch_id`` partitions of the index AND the corpus, so a
    replayed batch neither double-appends nor near-dedups against its own
    failed attempt's output. Exact verification reads the accumulated
    survivor corpus — but only for candidate ids (semi-join inside
    ``neardedup_against_index``), so per-batch corpus I/O is bounded by
    the candidate set, not history size. The kept docs' band rows are
    appended to the index (one signature pass over kept docs — the
    index-maintenance cost every LSH-indexed corpus pays on ingest).
    """
    from batch_processing_pipeline_spark.operators.dedup import (
        minhash_band_index,
        neardedup_against_index,
    )

    spark = batch.sparkSession
    docs = batch.select(F.col(id_col), F.col(text_col))
    if has_committed_batches(spark, index_path):
        index = spark.read.parquet(index_path).where(
            F.col("batch") < F.lit(int(epoch_id))
        )
        corpus = (
            spark.read.parquet(out_path)
            .where(F.col("batch") < F.lit(int(epoch_id)))
            .select(F.col(id_col), F.col(text_col))
        )
    else:
        # bootstrap: no history — within-batch pass only, via an empty
        # index (schema: id, sig, band_id, band_key); the id field's type
        # follows the batch schema so a string-keyed corpus bootstraps the
        # same index schema later batches will write
        id_type = batch.schema[id_col].dataType.simpleString()
        index = spark.createDataFrame(
            [],
            f"{id_col} {id_type}, sig array<bigint>, band_id int, band_key bigint",
        )
        corpus = None
    kept_ids, _acct = neardedup_against_index(
        docs,
        index,
        snapshot=corpus,
        id_col=id_col,
        text_col=text_col,
        shingle_n=shingle_n,
        num_perm=num_perm,
        bands=bands,
        threshold=threshold,
    )
    # survivors keep the batch's FULL schema (like _merge_batch, which
    # only drops its own fingerprint column) — the probe relation above
    # is id+text because that's all the index needs, but downstream
    # consumers of out_path get every input column back
    kept_docs = batch.join(kept_ids.select(id_col), id_col, "left_semi").persist()
    try:
        kept_docs.write.mode("overwrite").parquet(
            f"{out_path}/batch={int(epoch_id)}"
        )
        minhash_band_index(
            kept_docs,
            id_col=id_col,
            text_col=text_col,
            shingle_n=shingle_n,
            num_perm=num_perm,
            bands=bands,
        ).write.mode("overwrite").parquet(f"{index_path}/batch={int(epoch_id)}")
    finally:
        kept_docs.unpersist()


def run_neardedup_stream(
    docs: DataFrame,
    index_path: str,
    out_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 5,
    num_perm: int = 32,
    bands: int = 8,
    threshold: float = 0.8,
    available_now: bool = True,
):
    """Cross-history streaming NEAR-dedup: the durable state is the LSH
    band index (operators/dedup.py ``minhash_band_index`` rows, batch-id
    partitioned), the streaming twin of the ``neardedup_against_index``
    corpus-refresh operator. Exact dedup's durable state is 16 B/doc of
    digests; near-dedup's is ~(num_perm+2)·8 B/doc/band of index rows —
    still O(history docs), never history text, and the probe touches
    text only for verified candidates."""
    writer = (
        docs.writeStream.foreachBatch(
            lambda b, epoch: _merge_batch_near(
                b,
                epoch,
                index_path,
                out_path,
                id_col,
                text_col,
                shingle_n,
                num_perm,
                bands,
                threshold,
            )
        )
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
