"""Streaming dedup: cross-batch fingerprint store drops re-ingested docs;
within-watermark dedup collapses duplicates inside the stream."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from batch_processing_pipeline_spark.streaming.dedup import (
    dedup_within_watermark,
    run_dedup_stream,
)

SCHEMA = "doc_id long, ts timestamp, text string"


def _write_docs(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for doc_id, ts, text in rows:
            f.write(json.dumps({"doc_id": doc_id, "ts": ts, "text": text}) + "\n")


def test_cross_batch_dedup_survives_restart(spark, tmp_path):
    src = str(tmp_path / "in")
    store = str(tmp_path / "fp_store")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    _write_docs(
        f"{src}/b1.json",
        [
            (1, "2024-01-01 00:00:00", "alpha doc"),
            (2, "2024-01-01 00:01:00", "beta doc"),
            (3, "2024-01-01 00:02:00", "  Alpha doc"),
        ],
    )
    stream = spark.readStream.schema(SCHEMA).json(src)
    q = run_dedup_stream(stream, store, out, ckpt)
    assert q.awaitTermination(120)

    first = {r.doc_id for r in spark.read.parquet(out).collect()}
    # doc 3 normalizes ("alpha doc") to doc 1's fingerprint → dropped
    assert first == {1, 2}

    # second run, new files: one true duplicate of history, one new doc
    _write_docs(
        f"{src}/b2.json",
        [
            (4, "2024-01-01 01:00:00", "beta doc"),
            (5, "2024-01-01 01:01:00", "gamma doc"),
        ],
    )
    stream2 = spark.readStream.schema(SCHEMA).json(src)
    q2 = run_dedup_stream(stream2, store, out, ckpt)
    assert q2.awaitTermination(120)

    final = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert final == {1, 2, 5}  # 4 deduped against the durable store


def test_merge_batch_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: replaying an epoch must overwrite its
    own batch partition, not append a second copy — and must not anti-join
    against fingerprints its own failed attempt recorded."""
    from batch_processing_pipeline_spark.streaming.dedup import _merge_batch

    store = str(tmp_path / "fp_store")
    out = str(tmp_path / "out")
    b0 = spark.createDataFrame(
        [(1, "alpha doc"), (2, "beta doc")], "doc_id long, text string"
    )
    _merge_batch(b0, 0, store, out, "doc_id", "text")
    b1 = spark.createDataFrame(
        [(3, "beta doc"), (4, "gamma doc")], "doc_id long, text string"
    )
    _merge_batch(b1, 1, store, out, "doc_id", "text")
    once = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert once == [1, 2, 4]  # 3 deduped against batch 0
    # replay epoch 1 (same data) — simulates a crash after the out write
    _merge_batch(b1, 1, store, out, "doc_id", "text")
    replayed = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert replayed == [1, 2, 4]
    fps = spark.read.parquet(store).count()
    assert fps == 3  # no duplicate fingerprints either


def test_dedup_within_watermark_drops_stream_dups(spark, tmp_path):
    src = str(tmp_path / "in")
    _write_docs(
        f"{src}/b1.json",
        [
            (1, "2024-01-01 00:00:00", "same text"),
            (2, "2024-01-01 00:05:00", "same text"),
            (3, "2024-01-01 00:10:00", "other text"),
        ],
    )
    stream = spark.readStream.schema(SCHEMA).json(src)
    q = (
        dedup_within_watermark(stream, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("wm_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    rows = spark.sql("SELECT doc_id FROM wm_dedup").collect()
    kept = {r.doc_id for r in rows}
    assert len(kept) == 2 and 3 in kept and len(kept & {1, 2}) == 1


def test_cross_batch_neardedup_band_index_survives_restart(spark, tmp_path):
    """Streaming NEAR-dedup: the durable state is the LSH band index.
    A later batch's doc that is a near-dup (one-word edit, not exact)
    of an earlier batch's survivor must drop; within-batch near-dups
    collapse to min id; the index accumulates across a restart."""
    from batch_processing_pipeline_spark.streaming.dedup import run_neardedup_stream

    src = str(tmp_path / "in")
    index = str(tmp_path / "band_index")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    _write_docs(
        f"{src}/b1.json",
        [
            (1, "2024-01-01 00:00:00",
             "the quick brown fox jumps over the lazy dog and runs far away into the dark woods tonight"),
            (2, "2024-01-01 00:01:00",
             "completely unrelated snapshot prose about distributed query engines and columnar parquet files"),
        ],
    )
    stream = spark.readStream.schema(SCHEMA).json(src)
    q = run_neardedup_stream(stream, index, out, ckpt)
    assert q.awaitTermination(180)
    first = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert first == {1, 2}

    _write_docs(
        f"{src}/b2.json",
        [
            # near-dup of history doc 1 (cat for dog) -> dropped via index probe
            (3, "2024-01-01 01:00:00",
             "the quick brown fox jumps over the lazy cat and runs far away into the dark woods tonight"),
            # within-batch near-dups -> 4 kept, 5 dropped
            (4, "2024-01-01 01:01:00",
             "spark structured streaming maintains incremental state across micro batches with checkpointed offsets"),
            (5, "2024-01-01 01:02:00",
             "spark structured streaming maintains incremental state across micro batches with checkpointed offset"),
            # genuinely new -> kept
            (6, "2024-01-01 01:03:00",
             "a totally fresh document with vocabulary overlapping neither history nor its batch siblings"),
        ],
    )
    stream2 = spark.readStream.schema(SCHEMA).json(src)
    q2 = run_neardedup_stream(stream2, index, out, ckpt)
    assert q2.awaitTermination(180)
    survivors = spark.read.parquet(out)
    final = {r.doc_id for r in survivors.collect()}
    assert final == {1, 2, 4, 6}
    # survivors keep the FULL input schema (like the exact twin), not
    # just (id, text): ts must survive for downstream watermarking
    assert {"doc_id", "ts", "text"} <= set(survivors.columns)
    assert survivors.where(F.col("ts").isNull()).count() == 0
    # the index holds band rows ONLY for survivors, batch-partitioned
    idx = spark.read.parquet(index)
    assert set(idx.columns) >= {"doc_id", "sig", "band_id", "band_key", "batch"}
    assert {r.doc_id for r in idx.select("doc_id").distinct().collect()} == {1, 2, 4, 6}
