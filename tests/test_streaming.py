"""Structured Streaming: windowed aggs match their batch twins; the
foreachBatch incremental autocomplete stream merges state across batches."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from batch_processing_pipeline_spark.streaming.jobs import (
    run_autocomplete_stream,
    stream_query_log,
    tumbling_event_counts,
)

EVENTS = [
    # (event_id, ts, user_id, event_type, value)
    (0, "2024-01-01 00:05:00", 1, "a", 1.0),
    (1, "2024-01-01 00:20:00", 1, "a", 2.0),
    (2, "2024-01-01 01:10:00", 1, "b", 3.0),
    (3, "2024-01-01 01:40:00", 2, "a", 4.0),
    (4, "2024-01-01 03:00:00", 2, "b", 5.0),
]
SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


def _write_json(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for e in rows:
            f.write(
                json.dumps(
                    {
                        "event_id": e[0],
                        "ts": e[1],
                        "user_id": e[2],
                        "event_type": e[3],
                        "value": e[4],
                    }
                )
                + "\n"
            )


def _await(query, timeout=60):
    assert query.awaitTermination(timeout)


def test_tumbling_stream_matches_batch(spark, tmp_path):
    src = tmp_path / "events_stream"
    _write_json(str(src / "part1.json"), EVENTS)
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    q = (
        tumbling_event_counts(stream, window="1 hour", watermark="30 minutes")
        .writeStream.format("memory")
        .queryName("tumbling_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    _await(q)
    got = {
        (r.ws.isoformat(), r.event_type): (r.n, r.sv)
        for r in spark.sql("SELECT * FROM tumbling_test").collect()
    }
    batch = spark.createDataFrame(EVENTS, "event_id long, ts string, user_id long, event_type string, value double")
    batch = batch.withColumn("ts", F.to_timestamp("ts"))
    expected = {
        ((r.h).isoformat(), r.event_type): (r.n, r.sv)
        for r in batch.groupBy(
            F.date_trunc("hour", "ts").alias("h"), "event_type"
        ).agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv")).collect()
    }
    assert got == expected


def test_autocomplete_stream_merges_across_batches(spark, tmp_path):
    logs = tmp_path / "logs"
    os.makedirs(logs)
    (logs / "2025-01-01-00.txt").write_text("test\ntest\nkheder\n")
    state_dir = str(tmp_path / "state")
    sugg_dir = str(tmp_path / "sugg")
    ckpt = str(tmp_path / "ckpt")

    stream = stream_query_log(spark, str(logs))
    q = run_autocomplete_stream(stream, state_dir, sugg_dir, ckpt, k=5)
    _await(q)
    state = spark.read.parquet(os.path.join(state_dir, "current"))
    freq = {(r.prefix, r.query): r.frequency for r in state.collect()}
    assert freq[("te", "test")] == 2

    # second file arrives → restart with same checkpoint → only new file read
    (logs / "2025-01-01-01.txt").write_text("test\n")
    stream2 = stream_query_log(spark, str(logs))
    q2 = run_autocomplete_stream(stream2, state_dir, sugg_dir, ckpt, k=5)
    _await(q2)
    state2 = spark.read.parquet(os.path.join(state_dir, "current"))
    freq2 = {(r.prefix, r.query): r.frequency for r in state2.collect()}
    assert freq2[("te", "test")] == 3  # 2 + 1, counted exactly once (H1)
    sugg = {r.prefix: list(r.completions) for r in spark.read.parquet(sugg_dir).collect()}
    assert sugg["te"] == ["test"]


def test_autocomplete_stream_bucketed_delta_publish(spark, tmp_path):
    """suggestion_buckets=N: each batch rewrites only the hash buckets its
    prefixes land in (dynamic partition overwrite); untouched buckets'
    files survive, and the serving table stays complete and current."""
    import os as _os

    logs = tmp_path / "logs"
    os.makedirs(logs)
    (logs / "2025-01-01-00.txt").write_text("test\ntest\nkheder\n")
    state_dir = str(tmp_path / "state")
    sugg_dir = str(tmp_path / "sugg")
    ckpt = str(tmp_path / "ckpt")

    q = run_autocomplete_stream(
        stream_query_log(spark, str(logs)), state_dir, sugg_dir, ckpt, k=5,
        suggestion_buckets=8,
    )
    _await(q)
    first = {r.prefix: list(r.completions) for r in spark.read.parquet(sugg_dir).collect()}
    assert first["te"] == ["test"] and "kh" in first

    # record per-bucket mtimes, then stream a batch touching ONLY "zebra"
    def bucket_mtimes():
        out = {}
        for d in _os.listdir(sugg_dir):
            if d.startswith("bucket="):
                files = [
                    _os.path.getmtime(_os.path.join(sugg_dir, d, f))
                    for f in _os.listdir(_os.path.join(sugg_dir, d))
                    if f.endswith(".parquet")
                ]
                out[d] = max(files) if files else 0.0
        return out

    before = bucket_mtimes()
    (logs / "2025-01-01-01.txt").write_text("zebra\n")
    q2 = run_autocomplete_stream(
        stream_query_log(spark, str(logs)), state_dir, sugg_dir, ckpt, k=5,
        suggestion_buckets=8,
    )
    _await(q2)
    after = bucket_mtimes()
    final = {r.prefix: list(r.completions) for r in spark.read.parquet(sugg_dir).collect()}
    # zebra's prefixes appeared; old suggestions survived in place
    assert final["ze"] == ["zebra"] and final["te"] == ["test"]
    zebra_buckets = {
        f"bucket={r.b}"
        for r in spark.createDataFrame([("ze",), ("zeb",), ("zebr",), ("zebra",)], "prefix string")
        .select(F.pmod(F.xxhash64("prefix"), F.lit(8)).alias("b")).distinct().collect()
    }
    untouched = set(before) - zebra_buckets
    assert untouched, "test needs at least one untouched bucket"
    for d in untouched:
        assert after[d] == before[d], f"untouched {d} was rewritten"


def test_autocomplete_stream_replay_does_not_double_count(spark, tmp_path):
    """H1 under at-least-once replay: losing the checkpoint makes the source
    replay batch 0 from scratch; the batch-id recorded in the state link
    must stop the merge from double-counting."""
    import shutil

    logs = tmp_path / "logs"
    os.makedirs(logs)
    (logs / "2025-01-01-00.txt").write_text("test\ntest\nkheder\n")
    state_dir = str(tmp_path / "state")
    sugg_dir = str(tmp_path / "sugg")
    ckpt = str(tmp_path / "ckpt")

    q = run_autocomplete_stream(stream_query_log(spark, str(logs)), state_dir, sugg_dir, ckpt, k=5)
    _await(q)
    state = spark.read.parquet(os.path.join(state_dir, "current"))
    assert {(r.prefix, r.query): r.frequency for r in state.collect()}[("te", "test")] == 2

    # checkpoint lost -> the whole input replays as batch 0
    shutil.rmtree(ckpt)
    q2 = run_autocomplete_stream(stream_query_log(spark, str(logs)), state_dir, sugg_dir, ckpt, k=5)
    _await(q2)
    state2 = spark.read.parquet(os.path.join(state_dir, "current"))
    freq2 = {(r.prefix, r.query): r.frequency for r in state2.collect()}
    assert freq2[("te", "test")] == 2  # NOT 4 — replay skipped the merge
    # and suggestions were still (re)published
    sugg = {r.prefix: list(r.completions) for r in spark.read.parquet(sugg_dir).collect()}
    assert sugg["te"] == ["test"]


def test_autocomplete_stream_bucketed_state(spark, tmp_path):
    """state_buckets=N: the cumulative state is partitioned by prefix-hash
    bucket and a micro-batch rewrites ONLY the buckets it touches — the
    per-batch write cost is bounded by touched state, not lifetime state.
    Replay (at-least-once) must not double-count (per-bucket batch stamp)."""
    import shutil

    logs = tmp_path / "logs"
    os.makedirs(logs)
    (logs / "2025-01-01-00.txt").write_text("test\ntest\nkheder\n")
    state_dir = str(tmp_path / "state")
    sugg_dir = str(tmp_path / "sugg")
    ckpt = str(tmp_path / "ckpt")

    q = run_autocomplete_stream(
        stream_query_log(spark, str(logs)), state_dir, sugg_dir, ckpt, k=5,
        state_buckets=8,
    )
    _await(q)
    from batch_processing_pipeline_spark.operators.state_store import (
        read_bucketed_state,
    )

    freq = {
        (r.prefix, r.query): r.frequency
        for r in read_bucketed_state(spark, state_dir).collect()
    }
    assert freq[("te", "test")] == 2

    def bucket_mtimes(root):
        out = {}
        for d in os.listdir(root):
            if d.startswith("bucket="):
                files = [
                    os.path.getmtime(os.path.join(root, d, f))
                    for f in os.listdir(os.path.join(root, d))
                    if f.endswith(".parquet")
                ]
                out[d] = max(files) if files else 0.0
        return out

    before = bucket_mtimes(state_dir)
    (logs / "2025-01-01-01.txt").write_text("zebra\n")
    q2 = run_autocomplete_stream(
        stream_query_log(spark, str(logs)), state_dir, sugg_dir, ckpt, k=5,
        state_buckets=8,
    )
    _await(q2)
    after = bucket_mtimes(state_dir)
    state2 = read_bucketed_state(spark, state_dir)
    freq2 = {(r.prefix, r.query): r.frequency for r in state2.collect()}
    # old counts carried forward untouched; new prefixes merged in
    assert freq2[("te", "test")] == 2
    assert freq2[("ze", "zebra")] == 1
    zebra_buckets = {
        f"bucket={r.b}"
        for r in spark.createDataFrame(
            [("ze",), ("zeb",), ("zebr",), ("zebra",)], "prefix string"
        )
        .select(F.pmod(F.xxhash64("prefix"), F.lit(8)).alias("b"))
        .distinct()
        .collect()
    }
    untouched = set(before) - zebra_buckets
    assert untouched, "test needs at least one untouched state bucket"
    for d in untouched:
        assert after[d] == before[d], f"untouched state {d} was rewritten"
    # suggestions stay complete: old prefix still served, new one appears
    sugg = {
        r.prefix: list(r.completions) for r in spark.read.parquet(sugg_dir).collect()
    }
    assert sugg["te"] == ["test"] and sugg["ze"] == ["zebra"]

    # at-least-once replay: drop the checkpoint so the source re-feeds
    # everything as one batch; per-bucket _merged_batch stamps must stop
    # any bucket from double-counting... but a FRESH checkpoint restarts
    # batch ids at 0 while buckets are stamped with later ids — exactly
    # the replay regime the guard covers (batch_id <= stored).
    shutil.rmtree(ckpt)
    q3 = run_autocomplete_stream(
        stream_query_log(spark, str(logs)), state_dir, sugg_dir, str(tmp_path / "ckpt2"), k=5,
        state_buckets=8,
    )
    _await(q3)
    freq3 = {
        (r.prefix, r.query): r.frequency
        for r in read_bucketed_state(spark, state_dir).collect()
    }
    assert freq3 == freq2, "replayed batches must not double-count"


def test_statestore_reader_observability(spark, tmp_path):
    """Spark's state-store reader (`format("statestore")`) reads a
    streaming aggregation's checkpointed operator state as a plain
    DataFrame — the debugging/observability surface for "what does my
    stateful query currently believe". Pinned here: the stored counts
    equal the stream's true grouped counts."""
    import os

    from pyspark.sql import functions as F

    src = tmp_path / "in"
    src.mkdir()
    (src / "a.txt").write_text("x\ny\nx\nz\nx\n")
    ckpt = str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("text")
        .load(str(src))
        .groupBy("value")
        .count()
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("ss_obs")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    state = (
        spark.read.format("statestore")
        .load(ckpt)
        .select(F.col("key.value").alias("k"), F.col("value.count").alias("n"))
    )
    got = {r.k: r.n for r in state.collect()}
    assert got == {"x": 3, "y": 1, "z": 1}


def test_stream_stream_join_matches_batch_twin(spark, tmp_path):
    """The watermarked click x purchase interval join emits exactly the
    rows the identical STATIC join produces on the same data (inner
    stream-stream joins must not drop in-watermark matches), and the
    range predicate keeps join state bounded (asserted via the query
    progress state metrics)."""
    from batch_processing_pipeline_spark.streaming.jobs import (
        click_purchase_join_stream,
    )

    rows = [
        (0, "2024-01-01 00:05:00", 1, "click", 0.0),
        (1, "2024-01-01 00:20:00", 1, "purchase", 9.0),   # joins click 0
        (2, "2024-01-01 00:50:00", 1, "purchase", 7.0),   # joins click 0
        (3, "2024-01-01 02:00:00", 1, "purchase", 5.0),   # outside lookback
        (4, "2024-01-01 00:10:00", 2, "click", 0.0),
        (5, "2024-01-01 00:30:00", 2, "click", 0.0),
        (6, "2024-01-01 00:40:00", 2, "purchase", 3.0),   # joins clicks 4+5
        (7, "2024-01-01 01:00:00", 3, "purchase", 1.0),   # no click
    ]
    cdir, pdir = str(tmp_path / "clicks"), str(tmp_path / "purchases")
    _write_json(os.path.join(cdir, "part-0.json"),
                [r for r in rows if r[3] == "click"])
    _write_json(os.path.join(pdir, "part-0.json"),
                [r for r in rows if r[3] == "purchase"])

    def read_side(path):
        return (
            spark.readStream.schema(SCHEMA).json(path)
        )

    joined = click_purchase_join_stream(read_side(cdir), read_side(pdir))
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await(q)
    got = {
        (r.click_id, r.p_id)
        for r in spark.sql("SELECT * FROM ssj").collect()
    }

    static = spark.createDataFrame(
        [(r[0], r[1], r[2], r[3], r[4]) for r in rows],
        "event_id long, ts string, user_id long, event_type string, value double",
    ).select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"),
        "user_id", "event_type", "value",
    )
    c = static.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts"), F.col("event_id").alias("click_id")
    )
    p = static.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_id"),
    )
    want = {
        (r.click_id, r.p_id)
        for r in c.join(
            p,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("click_ts") <= F.col("p_ts"))
            & (F.col("click_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
        ).collect()
    }
    assert got == want
    assert got == {(0, 1), (0, 2), (4, 6), (5, 6)}


def test_stream_batch_split_invariance_across_trigger_knob(spark, tmp_path):
    """The max_files_per_trigger knob (round-9 API promotion of the r8
    trigger-batching profile) must change ONLY how the backlog is split
    into micro-batches, never the result: same logs run with 2-file
    triggers, with the 24-file default, and with no cap at all produce
    identical cumulative state and identical suggestions."""
    logs = tmp_path / "logs"
    os.makedirs(logs)
    words = ["alpha", "alpine", "beta", "betamax", "gamma", "alpha"]
    for h in range(6):
        (logs / f"2025-01-01-{h:02d}.txt").write_text(
            "\n".join(words[: h + 1]) + "\n"
        )

    results = {}
    for label, mfpt in (("two", 2), ("default", None), ("nocap", 0)):
        base = tmp_path / f"run_{label}"
        kwargs = {} if mfpt is None else {"max_files_per_trigger": mfpt or None}
        q = run_autocomplete_stream(
            stream_query_log(spark, str(logs), **kwargs),
            str(base / "state"),
            str(base / "sugg"),
            str(base / "ckpt"),
            k=5,
        )
        _await(q)
        state = spark.read.parquet(os.path.join(str(base / "state"), "current"))
        results[label] = (
            {(r.prefix, r.query): r.frequency for r in state.collect()},
            {
                r.prefix: list(r.completions)
                for r in spark.read.parquet(str(base / "sugg")).collect()
            },
        )
    assert results["two"] == results["default"] == results["nocap"]


def test_weighted_reservoir_stream_matches_one_shot(spark, tmp_path):
    """run_weighted_reservoir_stream over 3 single-file micro-batches,
    then a RESTART from the same checkpoint with 2 more files: the final
    reservoir must equal the one-shot per-group A-RES top-k over all 5
    chunks — the streaming form inherits batch-split invariance, and the
    versioned-symlink state survives stream restarts."""
    import os

    from pyspark.sql import functions as F

    from batch_processing_pipeline_spark.operators.sampling import (
        weighted_reservoir_merge,
    )
    from batch_processing_pipeline_spark.streaming.jobs import (
        run_weighted_reservoir_stream,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .select("lang", "doc_id", F.col("n_chars").alias("weight"))
    )
    src = str(tmp_path / "src")
    os.makedirs(src)
    chunks = [docs.where(F.col("doc_id") % 5 == i) for i in range(5)]

    def arrive(i):
        chunks[i].coalesce(1).write.mode("overwrite").parquet(f"{src}/part{i}")
        # file-source streams watch one dir; move the data file in
        for f in os.listdir(f"{src}/part{i}"):
            if f.endswith(".parquet"):
                os.replace(f"{src}/part{i}/{f}", f"{src}/chunk{i}.parquet")

    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(state)

    def run_stream():
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = run_weighted_reservoir_stream(
            stream, state, ckpt, k=6, group_cols=["lang"],
            weight_col="weight", key_col="doc_id", seed="wstream",
        )
        q.awaitTermination()

    for i in range(3):
        arrive(i)
    run_stream()
    for i in range(3, 5):
        arrive(i)
    run_stream()  # restart from checkpoint: only the 2 new files replay

    got = sorted(
        (r.lang, r.doc_id)
        for r in spark.read.parquet(os.path.join(state, "current")).collect()
    )
    expect = sorted(
        (r.lang, r.doc_id)
        for r in weighted_reservoir_merge(
            None, docs, k=6, group_cols=["lang"],
            weight_col="weight", key_col="doc_id", seed="wstream",
        ).collect()
    )
    assert got == expect


def test_weighted_reservoir_stream_fresh_checkpoint_existing_state(spark, tmp_path):
    """Round-11 advice fix: a FRESH checkpoint dir against an EXISTING
    state dir restarts batch ids at 0, so the old guard (symlink
    batch=N vs batch_id) silently skipped every new batch until the new
    ids overtook the stale watermark. The guard is now scoped to the
    checkpoint lineage: under a new checkpoint the first batch always
    merges (idempotent), then the guard re-arms. Repro: 3 chunks under
    ckpt1 (one file per trigger -> state watermark batch=2), 2 more
    chunks arrive, rerun under ckpt2 WITHOUT maxFilesPerTrigger so all 5
    files land in batch_id=0 <= 2 — the buggy guard drops them all."""
    import os

    from pyspark.sql import functions as F

    from batch_processing_pipeline_spark.operators.sampling import (
        weighted_reservoir_merge,
    )
    from batch_processing_pipeline_spark.streaming.jobs import (
        run_weighted_reservoir_stream,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .select("lang", "doc_id", F.col("n_chars").alias("weight"))
    )
    src = str(tmp_path / "src")
    os.makedirs(src)
    chunks = [docs.where(F.col("doc_id") % 5 == i) for i in range(5)]

    def arrive(i):
        chunks[i].coalesce(1).write.mode("overwrite").parquet(f"{src}/part{i}")
        for f in os.listdir(f"{src}/part{i}"):
            if f.endswith(".parquet"):
                os.replace(f"{src}/part{i}/{f}", f"{src}/chunk{i}.parquet")

    state = str(tmp_path / "state")
    os.makedirs(state)

    def run_stream(ckpt, max_files):
        reader = spark.readStream.schema(docs.schema)
        if max_files:
            reader = reader.option("maxFilesPerTrigger", 1)
        q = run_weighted_reservoir_stream(
            reader.parquet(src), state, ckpt, k=6, group_cols=["lang"],
            weight_col="weight", key_col="doc_id", seed="wstream2",
        )
        q.awaitTermination()

    for i in range(3):
        arrive(i)
    run_stream(str(tmp_path / "ckpt1"), max_files=True)
    assert os.readlink(os.path.join(state, "current")).endswith("batch=2")

    for i in range(3, 5):
        arrive(i)
    # fresh checkpoint: replays chunks 0-4 as ONE batch with batch_id=0
    run_stream(str(tmp_path / "ckpt2"), max_files=False)

    got = sorted(
        (r.lang, r.doc_id)
        for r in spark.read.parquet(os.path.join(state, "current")).collect()
    )
    expect = sorted(
        (r.lang, r.doc_id)
        for r in weighted_reservoir_merge(
            None, docs, k=6, group_cols=["lang"],
            weight_col="weight", key_col="doc_id", seed="wstream2",
        ).collect()
    )
    assert got == expect

    # and the guard re-armed under the new lineage: an immediate restart
    # of ckpt2 with no new files must leave the state symlink unchanged
    tgt = os.readlink(os.path.join(state, "current"))
    run_stream(str(tmp_path / "ckpt2"), max_files=False)
    assert os.readlink(os.path.join(state, "current")) == tgt


def _make_serving_fakes():
    """Injectable sink fakes for the serving-pipeline tests. Defined
    INSIDE a function so cloudpickle ships the classes BY VALUE to
    executors (a module-level class in a test file pickles by reference
    to `test_streaming`, which executors cannot import)."""

    class FakeKV:
        """Redis-like store backed by a directory: executors and the
        driver share it through the filesystem (a dict would stay on the
        executor side). set/delete write/remove one file per key."""

        def __init__(self, root):
            self.root = root

        def set(self, key, value):
            import base64
            import os

            name = base64.urlsafe_b64encode(key.encode()).decode()
            with open(os.path.join(self.root, name), "w") as f:
                f.write(value)

        def delete(self, key):
            import base64
            import contextlib
            import os

            name = base64.urlsafe_b64encode(key.encode()).decode()
            with contextlib.suppress(FileNotFoundError):
                os.remove(os.path.join(self.root, name))

        def dump(self):
            import base64
            import os

            out = {}
            for name in os.listdir(self.root):
                key = base64.urlsafe_b64decode(name.encode()).decode()
                with open(os.path.join(self.root, name)) as f:
                    out[key] = f.read()
            return out

    class FakeProducer:
        """Kafka-like producer: appends (key, value-or-None) JSON lines
        to a shared log file; tombstones are value=None."""

        def __init__(self, path):
            self.path = path

        def send(self, key, value):
            import json

            with open(self.path, "a") as f:
                f.write(json.dumps([key, value]) + "\n")

    return FakeKV, FakeProducer


def test_autocomplete_serving_pipeline_end_to_end(spark, tmp_path):
    """The composed serving topology (round-11 stretch): querylog custom
    source -> incremental merge -> top-k -> changed-rows-only publish to
    injectable Redis/Kafka fakes, one symlink commit per batch. Pinned:
    (a) after two runs (3 hours, then 2 more late hours under the SAME
    checkpoint) the Redis store equals the one-shot suggestions table
    over all 5 hours; (b) the Kafka log's last record per key compacts
    to the same table (tombstones erase); (c) only CHANGED prefixes were
    re-published in run 2; (d) a restart with nothing new publishes
    nothing."""
    import json
    import os

    from pyspark.sql import functions as F

    from batch_processing_pipeline_spark.plans.autocomplete import (
        autocomplete_batch,
        suggestions,
    )
    from batch_processing_pipeline_spark.streaming.jobs import (
        run_autocomplete_serving_pipeline,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    lines = [
        r.q
        for r in docs.select(
            F.concat_ws(
                " ",
                F.slice(F.split(F.lower(F.trim(F.col("text"))), r"\s+"), 1, 2),
            ).alias("q")
        ).collect()
    ]
    logs = str(tmp_path / "logs")
    os.makedirs(logs)
    per = len(lines) // 5

    def arrive(hour_i):
        chunk = lines[hour_i * per : (hour_i + 1) * per]
        with open(os.path.join(logs, f"2025-01-01-{hour_i:02d}.txt"), "w") as f:
            f.write("\n".join(chunk) + "\n")

    FakeKV, FakeProducer = _make_serving_fakes()
    kv_root = str(tmp_path / "kv")
    os.makedirs(kv_root)
    kafka_log = str(tmp_path / "kafka.jsonl")
    work = str(tmp_path / "work")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(work)

    def run():
        q = run_autocomplete_serving_pipeline(
            spark, logs, work, ckpt, k=5,
            redis_client_factory=lambda root=kv_root: FakeKV(root),
            kafka_producer_factory=lambda p=kafka_log: FakeProducer(p),
        )
        q.awaitTermination()

    for i in range(3):
        arrive(i)
    run()
    kafka_after_run1 = sum(1 for _ in open(kafka_log))

    for i in range(3, 5):
        arrive(i)
    run()  # same checkpoint: only the 2 late hours replay

    # (a) serving store == one-shot over all 5 hours
    all_lines = spark.createDataFrame(
        [(ln,) for ln in lines[: per * 5]], "value string"
    )
    merged, _ = autocomplete_batch(all_lines, None, k=5)
    expect = {
        r.prefix: r.completions_json
        for r in suggestions(merged, k=5).collect()
    }
    got = FakeKV(kv_root).dump()
    assert got == expect

    # (b) kafka log compacts (last record per key, tombstones erase) to
    # the same table
    compacted = {}
    with open(kafka_log) as f:
        for line in f:
            key, value = json.loads(line)
            if value is None:
                compacted.pop(key, None)
            else:
                compacted[key] = value
    assert compacted == expect

    # (c) run 2 published only prefixes whose top-k CHANGED: strictly
    # fewer records than a full republish of the serving table
    kafka_after_run2 = sum(1 for _ in open(kafka_log))
    assert 0 < kafka_after_run2 - kafka_after_run1 < len(expect)

    # (d) restart with nothing new: no publish, store unchanged
    run()
    assert sum(1 for _ in open(kafka_log)) == kafka_after_run2
    assert FakeKV(kv_root).dump() == expect


def test_autocomplete_serving_pipeline_max_files_and_commit_guard(spark, tmp_path):
    """maxFilesPerTrigger throttles a LONG-RUNNING (processingTime) run:
    6 hour-files at 2 per trigger commit as three versioned batches, and
    the store ends complete. Under availableNow the cap must be REFUSED:
    the simple-reader API would drain only the first capped batch and
    silently drop the backlog (the pinned hazard)."""
    import os
    import time as _time

    import pytest as _pytest

    from batch_processing_pipeline_spark.streaming.jobs import (
        run_autocomplete_serving_pipeline,
    )

    logs = str(tmp_path / "logs")
    os.makedirs(logs)
    for i in range(6):
        with open(os.path.join(logs, f"2025-01-02-{i:02d}.txt"), "w") as f:
            f.write(f"query number {i}\nshared line\n")

    FakeKV, _ = _make_serving_fakes()
    kv_root = str(tmp_path / "kv")
    os.makedirs(kv_root)
    work = str(tmp_path / "work")
    os.makedirs(work)

    with _pytest.raises(ValueError, match="available_now=False"):
        run_autocomplete_serving_pipeline(
            spark, logs, work, str(tmp_path / "ckpt_bad"), k=5,
            max_files_per_trigger=2,
        )

    q = run_autocomplete_serving_pipeline(
        spark, logs, work, str(tmp_path / "ckpt"), k=5,
        redis_client_factory=lambda root=kv_root: FakeKV(root),
        max_files_per_trigger=2,
        available_now=False,
    )
    link = os.path.join(work, "current")
    deadline = _time.time() + 120
    try:
        # 6 files at 2 per trigger -> the final committed version is batch 2
        while _time.time() < deadline:
            if os.path.islink(link) and os.readlink(link).endswith("ver=2"):
                break
            _time.sleep(0.5)
        assert os.path.islink(link) and os.readlink(link).endswith("ver=2")
    finally:
        q.stop()
    store = FakeKV(kv_root).dump()
    # every hour's lines made it in: the shared prefix counts all 6 files
    assert "shared line" in store["sh"]


def test_autocomplete_serving_pipeline_bucketed_scale_path(spark, tmp_path):
    """state_buckets=N serving mode (round-11 scale path): per-batch
    work is scoped to TOUCHED buckets — the store still converges to the
    one-shot table across a restart (late hour), untouched buckets'
    suggestion files are not rewritten by a batch that misses them, and
    the Kafka log compacts to the store."""
    import json
    import os

    from pyspark.sql import functions as F

    from batch_processing_pipeline_spark.plans.autocomplete import (
        autocomplete_batch,
        suggestions,
    )
    from batch_processing_pipeline_spark.streaming.jobs import (
        run_autocomplete_serving_pipeline,
    )

    logs = str(tmp_path / "logs")
    os.makedirs(logs)
    with open(os.path.join(logs, "2025-01-03-00.txt"), "w") as f:
        f.write("test\ntest\nkheder\n")

    FakeKV, FakeProducer = _make_serving_fakes()
    kv_root = str(tmp_path / "kv")
    os.makedirs(kv_root)
    kafka_log = str(tmp_path / "kafka.jsonl")
    work = str(tmp_path / "work")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(work)

    def run():
        q = run_autocomplete_serving_pipeline(
            spark, logs, work, ckpt, k=5,
            redis_client_factory=lambda root=kv_root: FakeKV(root),
            kafka_producer_factory=lambda p=kafka_log: FakeProducer(p),
            state_buckets=8,
        )
        q.awaitTermination()

    run()
    sugg_dir = os.path.join(work, "suggestions")

    def bucket_mtimes():
        out = {}
        for d in os.listdir(sugg_dir):
            if d.startswith("bucket="):
                files = [
                    os.path.getmtime(os.path.join(sugg_dir, d, f))
                    for f in os.listdir(os.path.join(sugg_dir, d))
                    if f.endswith(".parquet")
                ]
                out[d] = max(files) if files else 0.0
        return out

    before = bucket_mtimes()
    # late hour touching ONLY "zebra"'s prefixes
    with open(os.path.join(logs, "2025-01-03-01.txt"), "w") as f:
        f.write("zebra\n")
    run()

    # store == one-shot over both hours
    all_lines = spark.createDataFrame(
        [("test",), ("test",), ("kheder",), ("zebra",)], "value string"
    )
    merged, _ = autocomplete_batch(all_lines, None, k=5)
    expect = {
        r.prefix: r.completions_json
        for r in suggestions(merged, k=5).collect()
    }
    assert FakeKV(kv_root).dump() == expect

    # untouched buckets' files survived batch 2 in place
    zebra_buckets = {
        f"bucket={r.b}"
        for r in spark.createDataFrame(
            [("ze",), ("zeb",), ("zebr",), ("zebra",)], "prefix string"
        )
        .select(F.pmod(F.xxhash64("prefix"), F.lit(8)).alias("b"))
        .distinct()
        .collect()
    }
    untouched = set(before) - zebra_buckets
    assert untouched, "fixture needs at least one untouched bucket"
    after = bucket_mtimes()
    for d in untouched:
        assert after[d] == before[d], f"untouched {d} was rewritten"

    # kafka log compacts to the store, and batch 2 published only
    # zebra's prefixes (the touched-bucket scope held)
    compacted, n_records = {}, 0
    with open(kafka_log) as f:
        for line in f:
            n_records += 1
            key, value = json.loads(line)
            if value is None:
                compacted.pop(key, None)
            else:
                compacted[key] = value
    assert compacted == expect
    zebra_prefixes = {"ze", "zeb", "zebr", "zebra"}
    run1_keys = {k for k in expect if k not in zebra_prefixes}
    assert n_records == len(run1_keys) + len(zebra_prefixes)


def _run_serving(spark, logs, work, ckpt, kv_root, kafka_log, buckets):
    from batch_processing_pipeline_spark.streaming.jobs import (
        run_autocomplete_serving_pipeline,
    )

    FakeKV, FakeProducer = _make_serving_fakes()
    q = run_autocomplete_serving_pipeline(
        spark, logs, work, ckpt, k=5,
        redis_client_factory=lambda root=kv_root: FakeKV(root),
        kafka_producer_factory=lambda p=kafka_log: FakeProducer(p),
        state_buckets=buckets,
    )
    q.awaitTermination()


def test_serving_pipeline_crash_between_publish_and_commit(spark, tmp_path):
    """Fault injection for the docstring's crash anatomy, BOTH layouts:
    the publish succeeds, then the batch dies BEFORE its commit point
    (symlink swap / bucketed suggestion overwrite). The restart must
    re-deliver the batch, recompute the IDENTICAL delta against the
    still-old serving table, re-publish it (at-least-once — the log gets
    the delta twice), and converge: store == one-shot, compacted Kafka
    log == store. A crash AFTER the commit is the already-pinned replay
    guard (max_files_and_commit_guard test); this pins the window the
    guard cannot cover."""
    import pyspark.sql.utils as _  # noqa: F401  (exception type varies by version)

    from batch_processing_pipeline_spark.plans.autocomplete import (
        autocomplete_batch,
        suggestions,
    )
    from batch_processing_pipeline_spark.sources import kafka as kafka_mod

    for mode, buckets in (("symlink", None), ("bucketed", 8)):
        base = tmp_path / mode
        logs = str(base / "logs")
        kv_root = str(base / "kv")
        os.makedirs(logs)
        os.makedirs(kv_root)
        kafka_log = str(base / "kafka.jsonl")
        work = str(base / "work")
        ckpt = str(base / "ckpt")
        os.makedirs(work)

        with open(os.path.join(logs, "2025-01-04-00.txt"), "w") as f:
            f.write("test\ntest\nkheder\n")
        _run_serving(spark, logs, work, ckpt, kv_root, kafka_log, buckets)

        # hour 1 arrives; its publish lands but the commit never does
        with open(os.path.join(logs, "2025-01-04-01.txt"), "w") as f:
            f.write("zebra\n")
        real_publish = kafka_mod.publish_delta_records

        def crash_after_publish(delta, factory, _real=real_publish):
            _real(delta, factory)
            raise RuntimeError("injected crash before the commit point")

        kafka_mod.publish_delta_records = crash_after_publish
        try:
            crashed = False
            try:
                _run_serving(spark, logs, work, ckpt, kv_root, kafka_log, buckets)
            except Exception as exc:  # StreamingQueryException wraps it
                crashed = "injected crash" in str(exc)
            assert crashed, f"[{mode}] injected crash did not surface"
        finally:
            kafka_mod.publish_delta_records = real_publish

        def zebra_records():
            out = []
            with open(kafka_log) as f:
                for line in f:
                    key, value = json.loads(line)
                    if key in {"ze", "zeb", "zebr", "zebra"}:
                        out.append((key, value))
            return sorted(out)

        first_publish = zebra_records()
        assert first_publish, f"[{mode}] crash fired before the publish"
        if mode == "symlink":
            # the commit point never ran: still serving the hour-0 version
            link = os.path.join(work, "current")
            assert os.path.basename(os.readlink(link)) == "ver=0"

        # restart: the batch re-delivers and must converge
        _run_serving(spark, logs, work, ckpt, kv_root, kafka_log, buckets)

        all_lines = spark.createDataFrame(
            [("test",), ("test",), ("kheder",), ("zebra",)], "value string"
        )
        merged, _ = autocomplete_batch(all_lines, None, k=5)
        expect = {
            r.prefix: r.completions_json
            for r in suggestions(merged, k=5).collect()
        }
        FakeKV, _unused = _make_serving_fakes()
        assert FakeKV(kv_root).dump() == expect, f"[{mode}] store diverged"

        # at-least-once: the SAME delta was published twice, verbatim
        both = zebra_records()
        assert both == sorted(first_publish + first_publish), (
            f"[{mode}] redelivered delta differs from the crashed publish"
        )

        # and the log still compacts to the store
        compacted = {}
        with open(kafka_log) as f:
            for line in f:
                key, value = json.loads(line)
                if value is None:
                    compacted.pop(key, None)
                else:
                    compacted[key] = value
        assert compacted == expect, f"[{mode}] compacted log diverged"


def test_serving_pipeline_hot_prefix_skew(spark, tmp_path):
    """VERDICT r11 stretch: a Zipf-hot prefix family (~30% of ALL query
    mass on one head token) must not break the bucketed serving path's
    scale contracts. Pinned: (a) correctness under skew — after a mixed
    run plus a hot-only late run the Redis store equals the one-shot
    suggestions table over everything; (b) O(touched buckets) survives a
    hot key — the late batch (hot family only) rewrites ONLY the
    buckets holding the hot family's prefixes, every other bucket's
    state AND suggestions files are byte-untouched; (c) the publish is
    delta-bounded — run 2 publishes only the hot family's prefixes, not
    the serving table; (d) the per-bucket top-k plans as
    WindowGroupLimit, so the hot group's rank filter runs below the
    sort instead of materializing the whole group in one window buffer."""
    import json
    import os

    from pyspark.sql import functions as F

    from batch_processing_pipeline_spark.operators.state_store import (
        read_bucketed_state,
    )
    from batch_processing_pipeline_spark.plans.autocomplete import (
        autocomplete_batch,
        suggestions,
    )
    from batch_processing_pipeline_spark.streaming.jobs import (
        run_autocomplete_serving_pipeline,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    cold = [
        r.q
        for r in docs.select(
            F.concat_ws(
                " ",
                F.slice(F.split(F.lower(F.trim(F.col("text"))), r"\s+"), 1, 2),
            ).alias("q")
        ).collect()
        if r.q
    ]
    hot = ["zzhot query"] * (len(cold) * 3 // 7)  # ~30% of total mass
    logs = str(tmp_path / "logs")
    os.makedirs(logs)
    per = len(cold) // 3
    for h in range(3):  # mixed load: cold tail + a slice of the hot family
        chunk = cold[h * per : (h + 1) * per] + hot[h * 20 : (h + 1) * 20]
        with open(os.path.join(logs, f"2025-01-01-{h:02d}.txt"), "w") as f:
            f.write("\n".join(chunk) + "\n")

    FakeKV, FakeProducer = _make_serving_fakes()
    kv_root = str(tmp_path / "kv")
    os.makedirs(kv_root)
    kafka_log = str(tmp_path / "kafka.jsonl")
    work = str(tmp_path / "work")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(work)
    BUCKETS = 8

    def run():
        q = run_autocomplete_serving_pipeline(
            spark, logs, work, ckpt, k=5,
            redis_client_factory=lambda root=kv_root: FakeKV(root),
            kafka_producer_factory=lambda p=kafka_log: FakeProducer(p),
            state_buckets=BUCKETS,
        )
        q.awaitTermination()

    run()
    kafka_run1 = sum(1 for _ in open(kafka_log))

    def bucket_mtimes(root):
        out = {}
        for d in os.listdir(root):
            if d.startswith("bucket="):
                files = [
                    os.path.getmtime(os.path.join(root, d, f))
                    for f in os.listdir(os.path.join(root, d))
                    if f.endswith(".parquet")
                ]
                out[d] = max(files) if files else 0.0
        return out

    state_dir = os.path.join(work, "state")
    sugg_dir = os.path.join(work, "suggestions")
    state_before = bucket_mtimes(state_dir)
    sugg_before = bucket_mtimes(sugg_dir)

    # the late hour is the HOT FAMILY ONLY (the skew burst) — a NEW hot
    # variant, so the burst genuinely changes the shared prefixes' top-k
    # (re-sending the incumbent would correctly publish an empty delta)
    n_late_hot = len(hot) - 60
    late_q = "zzhot quartz"
    with open(os.path.join(logs, "2025-01-01-03.txt"), "w") as f:
        f.write("\n".join([late_q] * n_late_hot) + "\n")
    run()  # same checkpoint: only the late hot hour replays

    # (b) only the hot family's prefix buckets were rewritten
    hot_prefixes = [late_q[:n] for n in range(2, len(late_q) + 1)]
    hot_buckets = {
        f"bucket={r.b}"
        for r in spark.createDataFrame(
            [(p,) for p in hot_prefixes], "prefix string"
        )
        .select(F.pmod(F.xxhash64("prefix"), F.lit(BUCKETS)).alias("b"))
        .distinct()
        .collect()
    }
    untouched = set(state_before) - hot_buckets
    assert untouched, "skew test needs >=1 bucket outside the hot family"
    state_after = bucket_mtimes(state_dir)
    sugg_after = bucket_mtimes(sugg_dir)
    for d in untouched:
        assert state_after[d] == state_before[d], f"state {d} rewritten"
        assert sugg_after[d] == sugg_before[d], f"suggestions {d} rewritten"

    # (c) run-2 publish is bounded by the delta: hot-family prefixes only
    with open(kafka_log) as f:
        run2_keys = {
            json.loads(line)[0] for line in list(f)[kafka_run1:]
        }
    assert run2_keys, "the hot burst must publish its changed prefixes"
    assert run2_keys <= set(hot_prefixes), run2_keys

    # (a) store equals the one-shot suggestions over ALL arrived lines
    all_lines = cold[: per * 3] + hot[:60] + [late_q] * n_late_hot
    merged, _ = autocomplete_batch(
        spark.createDataFrame([(ln,) for ln in all_lines], "value string"),
        None, k=5,
    )
    expect = {
        r.prefix: r.completions_json
        for r in suggestions(merged, k=5).collect()
    }
    got = FakeKV(kv_root).dump()
    assert got == expect

    # (d) the per-bucket top-k pushes the rank below the sort
    plan = suggestions(
        read_bucketed_state(spark, state_dir), k=5
    )._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan[:2000]
