"""Custom stateful operator: running per-key stats across micro-batches."""

from __future__ import annotations

import json
import os


from batch_processing_pipeline_spark.streaming.stateful import running_key_stats

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


def _write(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for i, (etype, value) in enumerate(rows):
            f.write(
                json.dumps(
                    {
                        "event_id": i,
                        "ts": "2024-01-01 00:00:00",
                        "user_id": 1,
                        "event_type": etype,
                        "value": value,
                    }
                )
                + "\n"
            )


def test_running_key_stats_accumulates_across_batches(spark, tmp_path):
    src = tmp_path / "src"
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    _write(str(src / "b1.json"), [("a", 1.0), ("a", 2.0), ("b", 10.0)])

    def run_once():
        # foreachBatch sink: supports checkpoint recovery (the memory sink
        # does not), which is exactly what this test exercises
        stream = spark.readStream.schema(SCHEMA).json(str(src))

        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(out)

        q = (
            running_key_stats(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180)

    run_once()
    got = {r.key: (r.n, r.total, r.peak) for r in spark.read.parquet(out).collect()}
    assert got["a"] == (2, 3.0, 2.0)
    assert got["b"] == (1, 10.0, 10.0)

    # second batch: per-key state must carry over via the checkpoint; the
    # update-mode output re-emits only the touched key
    _write(str(src / "b2.json"), [("a", 5.0)])
    run_once()
    rows = spark.read.parquet(out).collect()
    latest_a = max((r for r in rows if r.key == "a"), key=lambda r: r.n)
    assert (latest_a.n, latest_a.total, latest_a.peak) == (3, 8.0, 5.0)


def test_running_key_stats_tws_matches_legacy_api(spark, tmp_path):
    """The transformWithStateInPandas twin must produce the same running
    stats and carry state across restarts, so migration off
    applyInPandasWithState is semantics-preserving."""
    import pytest

    # the transformWithState state server speaks protobuf; this container
    # ships a broken google.protobuf, so the twin runs only where the
    # dependency exists (it is pure public API either way)
    pytest.importorskip("google.protobuf.descriptor")
    from batch_processing_pipeline_spark.streaming.stateful import (
        running_key_stats_tws,
    )

    # transformWithState requires the RocksDB state store provider
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    src = tmp_path / "src"
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    _write(str(src / "b1.json"), [("a", 1.0), ("a", 2.0), ("b", 10.0)])

    def run_once():
        stream = spark.readStream.schema(SCHEMA).json(str(src))

        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(out)

        q = (
            running_key_stats_tws(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180)

    try:
        run_once()
        got = {
            r.key: (r.n, r.total, r.peak) for r in spark.read.parquet(out).collect()
        }
        assert got["a"] == (2, 3.0, 2.0)
        assert got["b"] == (1, 10.0, 10.0)

        _write(str(src / "b2.json"), [("a", 5.0)])
        run_once()
        rows = spark.read.parquet(out).collect()
        latest_a = max((r for r in rows if r.key == "a"), key=lambda r: r.n)
        assert (latest_a.n, latest_a.total, latest_a.peak) == (3, 8.0, 5.0)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
