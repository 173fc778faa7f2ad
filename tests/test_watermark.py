"""Watermark semantics: late data beyond the watermark is dropped from
append-mode finalized windows; sliding windows emit overlapping buckets."""

from __future__ import annotations

import json
import os

from batch_processing_pipeline_spark.streaming.jobs import (
    sliding_event_counts,
    tumbling_event_counts,
)

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


def _write(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for i, (ts, etype) in enumerate(rows):
            f.write(
                json.dumps(
                    {"event_id": i, "ts": ts, "user_id": 1, "event_type": etype, "value": 1.0}
                )
                + "\n"
            )


def test_late_event_beyond_watermark_dropped(spark, tmp_path):
    """File 1 advances the watermark far ahead; file 2's very late event
    must not resurrect its (already finalized) window in append mode."""
    src = tmp_path / "src"
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    # batch 1: events at 00:xx and a far-future event pushing the watermark
    _write(str(src / "b1.json"), [("2024-01-01 00:10:00", "a"), ("2024-01-01 06:00:00", "a")])

    def run():
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )

        def sink(batch_df, batch_id):  # memory sink can't recover checkpoints
            batch_df.write.mode("append").parquet(out)

        q = (
            tumbling_event_counts(stream, window="1 hour", watermark="30 minutes")
            .writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180)

    run()
    # batch 2 (new run, same checkpoint): a VERY late event for hour 00
    _write(str(src / "b2.json"), [("2024-01-01 00:20:00", "a")])
    run()
    rows = spark.read.parquet(out).collect()
    hour0 = [r for r in rows if r.ws.hour == 0]
    # the hour-00 window was finalized with n=1 before the late event; the
    # late arrival is dropped, never re-emitted with n=2
    assert all(r.n == 1 for r in hour0)


def test_sliding_windows_overlap(spark, tmp_path):
    src = tmp_path / "src"
    _write(str(src / "b1.json"), [("2024-01-01 00:40:00", "a")])
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    q = (
        sliding_event_counts(stream, window="1 hour", slide="30 minutes")
        .writeStream.format("memory")
        .queryName("slide")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM slide").collect()
    # one event at 00:40 belongs to windows [00:00,01:00) and [00:30,01:30)
    starts = sorted(r.ws.strftime("%H:%M") for r in rows)
    assert starts == ["00:00", "00:30"]
