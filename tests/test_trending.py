"""Trending (windowed, non-cumulative) autocomplete stream."""

from __future__ import annotations

import json
import os

from batch_processing_pipeline_spark.streaming.trending import run_trending_stream

SCHEMA = "ts timestamp, value string"


def _write(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for ts, value in rows:
            f.write(json.dumps({"ts": ts, "value": value}) + "\n")


def test_trending_window_topk(spark, tmp_path):
    src = tmp_path / "src"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    # hour-0 window: "test"×2, "team"×1 → prefix "te" top = [test, team];
    # the far-future row closes hour 0 past the watermark
    _write(
        str(src / "b1.json"),
        [
            ("2024-01-01 00:05:00", "test"),
            ("2024-01-01 00:10:00", "Test "),
            ("2024-01-01 00:20:00", "team"),
            ("2024-01-01 09:00:00", "later"),
        ],
    )
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    q = run_trending_stream(stream, out, ckpt, window="1 hour", watermark="30 minutes", k=5)
    assert q.awaitTermination(180)

    rows = spark.read.parquet(out).collect()
    byprefix = {r.prefix: r for r in rows if r.ws.hour == 0}
    te = byprefix["te"]
    assert [(c.query, c.frequency) for c in te.completions] == [("test", 2), ("team", 1)]
    doc = json.loads(te.completions_json)
    assert doc[0] == {"query": "test", "frequency": 2}
    # windows carry their bounds (trending is per-window, not cumulative)
    assert te.we.hour == 1
