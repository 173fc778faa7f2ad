"""Suggestion diffing (CDC collapse) + stream-stream join with watermarks."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from batch_processing_pipeline_spark.plans.autocomplete import diff_suggestions

SUGG_SCHEMA = "prefix string, completions_json string"


def test_diff_suggestions_upserts_deletes_unchanged(spark):
    prev = spark.createDataFrame(
        [("aa", '["x"]'), ("bb", '["y"]'), ("cc", '["z"]')], SUGG_SCHEMA
    )
    cur = spark.createDataFrame(
        [("aa", '["x"]'), ("bb", '["y2"]'), ("dd", '["w"]')], SUGG_SCHEMA
    )
    got = {(r.prefix): (r.op, r.completions_json) for r in diff_suggestions(prev, cur).collect()}
    assert got == {
        "bb": ("upsert", '["y2"]'),   # changed payload
        "dd": ("upsert", '["w"]'),    # new prefix
        "cc": ("delete", None),       # disappeared
    }  # "aa" unchanged → absent


def test_diff_suggestions_first_batch_all_upserts(spark):
    cur = spark.createDataFrame([("aa", '["x"]')], SUGG_SCHEMA)
    got = diff_suggestions(None, cur).collect()
    assert [(r.prefix, r.op) for r in got] == [("aa", "upsert")]


def test_serving_delta_registry_row(spark):
    """The round-11 registry row: both publish verbs occur on the fixture,
    deletes carry a NULL payload, and a self-diff is empty (the idempotent
    replay contract the streaming pipeline relies on)."""
    from batch_processing_pipeline_spark.registry.curation import (
        _suggestion_snapshot,
        q_serving_delta,
    )

    sf = "/root/testdata/sf0.001"
    delta = q_serving_delta(spark, sf)
    assert delta.columns == ["prefix", "completions", "op"]
    ops = {r.op for r in delta.select("op").distinct().collect()}
    assert ops == {"upsert", "delete"}
    assert delta.where(
        (F.col("op") == "delete") & F.col("completions").isNotNull()
    ).count() == 0
    assert delta.where(
        (F.col("op") == "upsert") & F.col("completions").isNull()
    ).count() == 0
    # self-diff == empty: redelivering an already-applied snapshot publishes
    # nothing (diff_suggestions is the dedup gate in the serving pipeline)
    docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
    snap = _suggestion_snapshot(docs)
    assert (
        diff_suggestions(snap, snap, payload_col="completions").count() == 0
    )


EVENT_SCHEMA = "id long, ts timestamp, kind string"


def _write(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for i, (ts, kind) in enumerate(rows):
            f.write(json.dumps({"id": i, "ts": ts, "kind": kind}) + "\n")


def test_stream_stream_join_with_watermarks(spark, tmp_path):
    """Inner join of two watermarked streams with a time-bound condition —
    the join type the reference entirely lacks, in streaming form."""
    views_dir = tmp_path / "views"
    clicks_dir = tmp_path / "clicks"
    _write(str(views_dir / "v.json"), [("2024-01-01 00:00:00", "view"), ("2024-01-01 02:00:00", "view")])
    _write(str(clicks_dir / "c.json"), [("2024-01-01 00:10:00", "click")])

    views = (
        spark.readStream.schema(EVENT_SCHEMA).json(str(views_dir))
        .withWatermark("ts", "1 hour")
        .select(F.col("id").alias("v_id"), F.col("ts").alias("v_ts"))
    )
    clicks = (
        spark.readStream.schema(EVENT_SCHEMA).json(str(clicks_dir))
        .withWatermark("ts", "1 hour")
        .select(F.col("id").alias("c_id"), F.col("ts").alias("c_ts"))
    )
    joined = views.join(
        clicks,
        F.expr(
            "v_id = c_id AND c_ts BETWEEN v_ts AND v_ts + INTERVAL 30 MINUTES"
        ),
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssjoin")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM ssjoin").collect()
    # view id=0 at 00:00 matches click id=0 at 00:10 (within 30 min);
    # view id=1 at 02:00 has no click
    assert len(rows) == 1
    assert rows[0].v_id == 0
