"""Structured Streaming mode.

The reference runs the batch job every 5 minutes from a Kubernetes CronJob
(``README.md:31-41``) over "the last 24 hours" of hourly files
(``README.md:86``), then ships results MySQL → Debezium → Kafka → Redis
(``docker-compose.yml:126-184``). A Spark-first design collapses that whole
topology: a file-source stream with ``availableNow`` (cron parity) or a
processing-time trigger, ``foreachBatch`` driving the same incremental merge
the batch plan uses, publishing changed prefixes directly to the sink
(parquet / Kafka / JDBC) — no CDC hop.

Cumulative frequency state is unbounded (prefix × query keyspace), so it
lives in the merged store (parquet here), NOT in Structured Streaming
operator state; only windowed/trending aggregations keep operator state
(bounded by watermarks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from batch_processing_pipeline_spark.plans.autocomplete import autocomplete_batch


# Default trigger batching for the hourly-log stream. Chosen from the
# round-8 profile (PLANS.md, commit b34a4ed): wall time is LINEAR in
# trigger count at fixture scale — each micro-batch pays ~1.5 s of fixed
# overhead (state read + plan + commit) regardless of rows, so 24 files in
# 6 triggers ran 9.9 s where 1 trigger ran 1.9 s. One reference day = 24
# hourly files (README.md:86's "last 24 hours"), so the default folds a
# full day's backlog into ONE trigger (cron parity: the reference's 5-min
# batch job also merges its window in one pass) while still bounding a
# multi-day backfill to day-sized batches instead of one giant batch.
DEFAULT_MAX_FILES_PER_TRIGGER = 24


def stream_query_log(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = DEFAULT_MAX_FILES_PER_TRIGGER,
) -> DataFrame:
    """File-source stream over the hourly query-log directory.

    ``max_files_per_trigger`` bounds each micro-batch; results are
    batch-split invariant (the foreachBatch merge is associative and
    replay-guarded — pinned by ``tests/test_streaming.py``), so the knob
    trades per-trigger fixed cost against per-batch memory only. ``None``
    = no cap (availableNow folds the whole backlog into one trigger).
    """
    reader = spark.readStream.format("text")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def tumbling_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Watermarked tumbling-window counts (batch twin: DQ23)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv"))
        .select(F.col("w.start").alias("ws"), F.col("w.end").alias("we"), key_col, "n", "sv")
    )


def sliding_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Watermarked sliding-window counts."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window, slide).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), F.col("w.end").alias("we"), key_col, "n")
    )


def session_event_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Session-window counts (streaming twin of operators.sessionize / DQ24)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("w"), F.col(user_col))
        .agg(F.count(F.lit(1)).alias("events_in_session"))
        .select(
            F.col("w.start").alias("ws"),
            F.col("w.end").alias("we"),
            user_col,
            "events_in_session",
        )
    )


def run_autocomplete_stream(
    raw_stream: DataFrame,
    state_dir: str,
    suggestions_dir: str,
    checkpoint_dir: str,
    k: int = 10,
    available_now: bool = True,
    suggestion_buckets: int | None = None,
    state_buckets: int | None = None,
):
    """Streaming incremental autocomplete via ``foreachBatch``.

    Each micro-batch: read current state parquet → merge batch counts →
    write state to a NEW versioned path (stage-then-swap, H1/H2) → write
    suggestions. Returns the started StreamingQuery.

    Crash-safety (H1):

    * ``current`` is a SYMLINK repointed with ``os.replace`` (write the new
      link under a temp name, rename over) — atomic on POSIX, so there is
      no instant where no valid state exists. On an object store the
      equivalent is a manifest/pointer object swapped with a single PUT.
    * foreachBatch is at-least-once: the merged-through batch id is encoded
      in the link target (``batch=<id>``); a replayed batch with
      ``batch_id <= stored`` must NOT merge again (that would double-count
      — the H1 hazard), so it only re-emits suggestions from the current
      state, which is deterministic and overwrite-idempotent.

    Scale (``suggestion_buckets=N``): suggestions are written partitioned
    by ``bucket = pmod(xxhash64(prefix), N)`` with dynamic partition
    overwrite, and each batch recomputes ONLY the buckets containing a
    prefix the batch touched — per-batch publish cost is
    ``(touched buckets / N) × state``, not the whole serving table. A
    bucket must be rewritten whole (dynamic overwrite replaces the
    partition), which is why bucketing beats partition-per-prefix: N stays
    bounded (file count, listing) while small batches still skip most of
    the table. ``None`` keeps the simple full-rewrite (bench/test default
    for tiny states).

    ``state_buckets=N`` additionally buckets the cumulative STATE itself
    (``operators.state_store.merge_touched_buckets``): each micro-batch
    reads and rewrites only the state buckets its prefixes hash into, so
    per-batch state I/O is O(touched state) instead of a full rewrite of
    cumulative state — the one per-batch cost that otherwise grows
    linearly with lifetime state under the reference's 5-min-cron regime.
    State rows are bucketed by PREFIX, so a prefix's full completion list
    lives in one bucket and suggestions re-rank from pruned partitions
    only; suggestions are then published bucketed by the same hash
    (``suggestion_buckets`` is ignored in this mode). Replay safety moves
    from the symlink batch-id to a per-bucket ``_merged_batch`` stamp —
    an at-least-once redelivery merges only buckets that missed it.
    """
    import os

    spark = raw_stream.sparkSession

    def _merged_through(state_path: str) -> int:
        """Batch id recorded in the current-state link target, -1 if none."""
        if not os.path.islink(state_path):
            return -1
        target = os.path.basename(os.readlink(state_path))
        try:
            return int(target.split("=", 1)[1])
        except (IndexError, ValueError):
            return -1

    def _publish(merged: DataFrame, touched: DataFrame | None) -> None:
        """Write the serving table. ``touched``: delta prefixes (None =
        publish everything — first batch / replay repair)."""
        from batch_processing_pipeline_spark.plans.autocomplete import suggestions

        if suggestion_buckets is None:
            suggestions(merged, k=k).write.mode("overwrite").parquet(suggestions_dir)
            return
        bucket = F.pmod(F.xxhash64(F.col("prefix")), F.lit(suggestion_buckets))
        scope = merged
        if touched is not None:
            affected = [
                r.b for r in touched.select(bucket.alias("b")).distinct().collect()
            ]
            scope = merged.where(bucket.isin(affected))
        (
            suggestions(scope, k=k)
            .withColumn("bucket", bucket)
            .write.partitionBy("bucket")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .parquet(suggestions_dir)
        )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        from batch_processing_pipeline_spark.operators.prefix import (
            normalize_queries,
            prefix_frequencies,
        )

        state_path = os.path.join(state_dir, "current")
        last = _merged_through(state_path)
        if last >= batch_id:
            # replayed batch: state already includes it — merging again
            # would double-count. Re-emit the (deterministic) suggestions
            # so a crash between swap and suggestion write is repaired.
            _publish(spark.read.parquet(state_path), touched=None)
            return
        prev = None
        if os.path.exists(state_path):
            prev = spark.read.parquet(state_path)
        merged, _ = autocomplete_batch(batch_df, prev, k=k)
        staged = os.path.join(state_dir, f"batch={batch_id}")
        merged.write.mode("overwrite").parquet(staged)
        materialized = spark.read.parquet(staged)
        # only prefixes in THIS batch can have changed top-k
        touched = (
            prefix_frequencies(normalize_queries(batch_df)).select("prefix").distinct()
            if prev is not None and suggestion_buckets is not None
            else None
        )
        _publish(materialized, touched)
        # atomic swap: temp symlink + rename-over; never an empty window
        old_target = os.readlink(state_path) if os.path.islink(state_path) else None
        tmp_link = os.path.join(state_dir, f".current.tmp.{batch_id}")
        if os.path.lexists(tmp_link):
            os.remove(tmp_link)
        os.symlink(staged, tmp_link)
        os.replace(tmp_link, state_path)
        if old_target is not None and os.path.isdir(old_target):
            # pointer moved; previous state version is unreferenced
            import shutil

            shutil.rmtree(old_target, ignore_errors=True)

    # per-run replay-stamp cache (round 13): scoped to THIS streaming query
    # run — a restart builds a fresh closure, so the first trigger after
    # any (re)start still checks stamps; see merge_touched_buckets
    _known_stamps: dict[int, int] = {}

    def process_batch_bucketed(batch_df: DataFrame, batch_id: int) -> None:
        from batch_processing_pipeline_spark.operators.prefix import (
            normalize_queries,
            prefix_frequencies,
        )
        from batch_processing_pipeline_spark.operators.state_store import (
            merge_touched_buckets,
            read_bucketed_state,
            state_bucket,
        )
        from batch_processing_pipeline_spark.plans.autocomplete import suggestions

        delta = prefix_frequencies(normalize_queries(batch_df))
        # merge_touched_buckets returns the DELTA's full bucket set (pre
        # replay-guard) — exactly the publish scope: after a crash between
        # a partial state commit and the publish, a redelivery skips the
        # already-stamped buckets in the merge, but their suggestions were
        # never written, so the publisher must still cover them.
        # Publishing from current state is idempotent either way.
        publish = merge_touched_buckets(
            spark, delta, state_dir, batch_id, buckets=state_buckets,
            known_stamps=_known_stamps,
        )
        if not publish:
            return
        scope = read_bucketed_state(spark, state_dir, publish)
        (
            suggestions(scope, k=k)
            .withColumn("bucket", state_bucket("prefix", state_buckets))
            .write.partitionBy("bucket")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .parquet(suggestions_dir)
        )

    fn = process_batch if state_buckets is None else process_batch_bucketed
    writer = raw_stream.writeStream.foreachBatch(fn).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_autocomplete_serving_pipeline(
    spark: SparkSession,
    logs_dir: str,
    work_dir: str,
    checkpoint_dir: str,
    k: int = 10,
    redis_client_factory=None,
    kafka_producer_factory=None,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    state_buckets: int | None = None,
):
    """The reference's ENTIRE serving topology as one checkpointed job
    (VERDICT r10 stretch): hourly query-log files → incremental prefix
    merge → top-k suggestions → CHANGED-ROWS-ONLY publish to the Redis
    serving store and a Kafka topic. What the reference runs as a 5-min
    cron Spark job + MySQL + Debezium + Kafka Connect + a consumer
    (``README.md:31-41``, ``docker-compose.yml:67-184``) is here a single
    ``availableNow`` restartable pipeline:

    - source: the custom ``querylog`` DataSource (``sources/pyds.py``) —
      each hourly file is one planned partition, late hours appear in
      exactly one micro-batch via the seen-set offset;
    - state + serving table live under ONE versioned directory
      (``ver=<batch_id>/{state,suggestions}``) committed by a single
      symlink swap — no instant where state and suggestions disagree
      (the split-brain a two-pointer design invites);
    - the CDC hop collapses to ``diff_suggestions`` (anti-joins of
      (key, payload) projections): only prefixes whose top-k CHANGED are
      published — SET/DEL on Redis, keyed records with delete-as-
      tombstone on Kafka (the log-compacted-topic contract);
    - restart-equals-one-shot: merges are deterministic and the publish
      verbs are idempotent, so an at-least-once redelivery (crash
      anywhere between state write and symlink swap) recomputes and
      re-publishes the SAME delta; a replay of a fully-committed batch
      is skipped by the version guard. Pinned in
      tests/test_streaming.py.

    Scale: per-batch cost is O(batch) for the merge (map-side partial
    aggregation into the cumulative state — ``autocomplete_batch``) plus
    O(serving-table digests) for the diff; at a serving table too large
    to diff per batch, compose with the bucketed state store
    (``run_autocomplete_stream(state_buckets=...)``) and scope the diff
    to touched buckets — this demo keeps the simple layout the reference
    itself serves.

    ``redis_client_factory`` / ``kafka_producer_factory`` are the
    injectable sink clients (``sinks/redis.py publish_delta``,
    ``sources/kafka.py publish_delta_records``); either may be None.

    ``state_buckets=N`` is the SCALE PATH (round-11): state lives in the
    bucket-partitioned store (``operators/state_store.py``, per-bucket
    ``_merged_batch`` replay stamps), suggestions are recomputed and
    dynamically overwritten ONLY for the buckets a batch touched, and
    the delta diff reads ONLY those buckets' stored suggestions — so
    per-batch cost is O(touched buckets), never O(serving table), the
    one term that grows with lifetime state in the simple layout.
    Publish ordering inverts relative to the symlink mode: the delta is
    computed and PUBLISHED against the stored (pre-overwrite)
    suggestions, THEN the touched partitions are overwritten — a crash
    between the two re-delivers the batch, the state merge skips
    (stamped), the same delta recomputes against the still-old stored
    rows, and the idempotent verbs re-apply; a crash after the overwrite
    re-publishes nothing (empty diff), which is correct because the
    first attempt already published.
    """
    import os
    import shutil

    from batch_processing_pipeline_spark.plans.autocomplete import (
        autocomplete_batch,
        diff_suggestions,
        suggestions,
    )
    from batch_processing_pipeline_spark.sinks.redis import publish_delta
    from batch_processing_pipeline_spark.sources.kafka import (
        publish_delta_records,
    )
    from batch_processing_pipeline_spark.sources.pyds import (
        QueryLogDataSource,
    )

    if available_now and max_files_per_trigger is not None:
        # The simple stream-reader API under Trigger.AvailableNow drains
        # only the offset range of its FIRST prefetch read — a per-batch
        # cap would make the one-shot run silently stop after one capped
        # batch, dropping the rest of the backlog (observed, and pinned
        # in tests). The cap is a throttle for LONG-RUNNING triggers.
        raise ValueError(
            "max_files_per_trigger requires available_now=False "
            "(a processingTime stream); an availableNow run would drain "
            "only the first capped batch"
        )
    spark.dataSource.register(QueryLogDataSource)
    reader = spark.readStream.format("querylog").option("path", logs_dir)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.load()

    link = os.path.join(work_dir, "current")

    def _committed_through() -> int:
        if not os.path.islink(link):
            return -1
        try:
            return int(os.path.basename(os.readlink(link)).split("=", 1)[1])
        except (IndexError, ValueError):
            return -1

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if _committed_through() >= batch_id:
            return  # fully committed: state, suggestions AND publish done
        prev_state = None
        prev_sugg = None
        if os.path.islink(link):
            prev_state = spark.read.parquet(os.path.join(link, "state"))
            prev_sugg = spark.read.parquet(os.path.join(link, "suggestions"))
        ver_dir = os.path.join(work_dir, f"ver={batch_id}")
        merged, _ = autocomplete_batch(batch_df, prev_state, k=k)
        merged.write.mode("overwrite").parquet(os.path.join(ver_dir, "state"))
        materialized = spark.read.parquet(os.path.join(ver_dir, "state"))
        suggestions(materialized, k=k).write.mode("overwrite").parquet(
            os.path.join(ver_dir, "suggestions")
        )
        cur_sugg = spark.read.parquet(os.path.join(ver_dir, "suggestions"))
        delta = diff_suggestions(prev_sugg, cur_sugg).localCheckpoint(eager=True)
        if redis_client_factory is not None:
            publish_delta(delta, redis_client_factory)
        if kafka_producer_factory is not None:
            publish_delta_records(delta, kafka_producer_factory)
        # the ONE commit point: everything before it is recomputed (and
        # re-published idempotently) on redelivery
        old_target = os.readlink(link) if os.path.islink(link) else None
        tmp = os.path.join(work_dir, f".current.tmp.{batch_id}")
        if os.path.lexists(tmp):
            os.remove(tmp)
        os.symlink(ver_dir, tmp)
        os.replace(tmp, link)
        if old_target is not None and os.path.isdir(old_target):
            shutil.rmtree(old_target, ignore_errors=True)

    # per-run replay-stamp cache (round 13; see run_autocomplete_stream)
    _known_stamps: dict[int, int] = {}

    def process_batch_bucketed(batch_df: DataFrame, batch_id: int) -> None:
        from batch_processing_pipeline_spark.operators.prefix import (
            normalize_queries,
            prefix_frequencies,
        )
        from batch_processing_pipeline_spark.operators.state_store import (
            merge_touched_buckets,
            read_bucketed_state,
            state_bucket,
        )

        state_dir = os.path.join(work_dir, "state")
        sugg_dir = os.path.join(work_dir, "suggestions")
        delta_freq = prefix_frequencies(normalize_queries(batch_df))
        touched = merge_touched_buckets(
            spark, delta_freq, state_dir, batch_id, buckets=state_buckets,
            known_stamps=_known_stamps,
        )
        if not touched:
            return
        bucket = state_bucket("prefix", state_buckets)
        cur = (
            suggestions(read_bucketed_state(spark, state_dir, touched), k=k)
            .withColumn("bucket", bucket)
            .localCheckpoint(eager=True)
        )
        prev = None
        existing = [
            b
            for b in touched
            if os.path.isdir(os.path.join(sugg_dir, f"bucket={b}"))
        ]
        if existing:
            prev = (
                spark.read.option("basePath", sugg_dir)
                .parquet(
                    *[os.path.join(sugg_dir, f"bucket={b}") for b in existing]
                )
            )
        delta = diff_suggestions(prev, cur).localCheckpoint(eager=True)
        if redis_client_factory is not None:
            publish_delta(delta, redis_client_factory)
        if kafka_producer_factory is not None:
            publish_delta_records(delta, kafka_producer_factory)
        # overwrite LAST (see the docstring's crash anatomy)
        (
            cur.write.partitionBy("bucket")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .parquet(sugg_dir)
        )

    fn = process_batch if state_buckets is None else process_batch_bucketed
    writer = stream.writeStream.foreachBatch(fn).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_weighted_reservoir_stream(
    docs_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    k: int = 50,
    group_cols=None,
    weight_col: str = "weight",
    key_col: str = "doc_id",
    seed: str = "wres",
    available_now: bool = True,
):
    """Streaming weighted reservoir (A-RES) via ``foreachBatch`` — keep
    the ``k`` highest-key rows seen so far (per group with
    ``group_cols``), exactly as if the whole stream had been sampled in
    one shot (``operators/sampling.py weighted_reservoir_merge``'s
    batch-split invariance). The training-data use: maintain a live
    weighted sample of an arriving corpus without ever re-reading
    history.

    State = the reservoir itself (k rows, or k per group — KBs), written
    to a versioned ``batch=<id>`` path and swapped in with the
    ``run_autocomplete_stream`` symlink discipline (atomic repoint, no
    empty-state instant). Replays are DOUBLY safe: the batch-id guard
    skips them, and even an unguarded re-merge would be a no-op because
    the merge key-dedups deterministic duplicates.

    The batch-id guard is scoped to the CHECKPOINT LINEAGE (round-11
    advice fix): batch ids restart at 0 under a fresh checkpoint, so a
    restart with a new ``checkpoint_dir`` against an existing
    ``state_dir`` must not compare new ids to the old lineage's
    watermark — that would silently skip real batches until the new id
    overtook the stale one. The state sidecar records the streaming
    query id (from the checkpoint's ``metadata`` file); on mismatch the
    guard is ignored for that batch (the merge itself is idempotent, so
    re-merging is always safe — only SKIPPING needs the guard) and the
    sidecar is re-pointed at the new lineage.
    """
    import json
    import os
    import shutil

    from batch_processing_pipeline_spark.operators.sampling import (
        weighted_reservoir_merge,
    )

    spark = docs_stream.sparkSession

    def _merged_through(state_path: str) -> int:
        if not os.path.islink(state_path):
            return -1
        target = os.path.basename(os.readlink(state_path))
        try:
            return int(target.split("=", 1)[1])
        except (IndexError, ValueError):
            return -1

    def _lineage_id() -> str | None:
        """The streaming query id Spark pins inside the checkpoint —
        stable across restarts of the SAME checkpoint, fresh for a new
        one. None when unreadable (treat as unknown lineage: never skip)."""
        try:
            with open(os.path.join(checkpoint_dir, "metadata")) as f:
                return str(json.load(f).get("id"))
        except (OSError, ValueError):
            return None

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        state_path = os.path.join(state_dir, "current")
        sidecar = os.path.join(state_dir, ".checkpoint_id")
        lineage = _lineage_id()
        try:
            with open(sidecar) as f:
                known = f.read().strip()
        except OSError:
            known = None
        same_lineage = lineage is not None and lineage == known
        if same_lineage and _merged_through(state_path) >= batch_id:
            return  # replay within this lineage: already merged
        prev = (
            spark.read.parquet(state_path)
            if os.path.exists(state_path)
            else None
        )
        merged = weighted_reservoir_merge(
            prev,
            batch_df,
            k=k,
            group_cols=group_cols,
            weight_col=weight_col,
            key_col=key_col,
            seed=seed,
        )
        staged = os.path.join(state_dir, f"batch={batch_id}")
        merged.write.mode("overwrite").parquet(staged)
        old_target = (
            os.readlink(state_path) if os.path.islink(state_path) else None
        )
        tmp_link = os.path.join(state_dir, f".current.tmp.{batch_id}")
        if os.path.lexists(tmp_link):
            os.remove(tmp_link)
        os.symlink(staged, tmp_link)
        os.replace(tmp_link, state_path)
        if old_target is not None and os.path.isdir(old_target):
            shutil.rmtree(old_target, ignore_errors=True)
        if lineage is not None and not same_lineage:
            # adopt the new checkpoint lineage AFTER its first successful
            # merge: a crash before this point re-runs the merge (safe),
            # never skips (the guard stays disabled until adopted)
            tmp = sidecar + ".tmp"
            with open(tmp, "w") as f:
                f.write(lineage)
            os.replace(tmp, sidecar)

    writer = docs_stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def click_purchase_join_stream(
    clicks: DataFrame,
    purchases: DataFrame,
    lookback: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream INNER interval join — the canonical
    two-stream correlation (online conversion attribution: every purchase
    paired with the same user's clicks inside the lookback).

    Both inputs carry watermarks and the join condition is a user
    equi-key plus a bounded time range, which is exactly what lets the
    state store evict: a buffered click can only ever match purchases
    with ``p_ts`` within ``lookback`` of it, so once the purchase-side
    watermark passes ``click_ts + lookback`` the row is dropped — state
    is bounded by (rate × (watermark + lookback)), not by stream length.
    An unbounded-condition stream-stream join would grow state forever;
    the range predicate IS the scale design."""
    c = clicks.withWatermark("ts", watermark).select(
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    p = purchases.withWatermark("ts", watermark).select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_id"),
        F.col("value").alias("revenue"),
    )
    return c.join(
        p,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("click_ts") <= F.col("p_ts"))
        & (F.col("click_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {lookback}")),
        "inner",
    ).select("user_id", "click_id", "click_ts", "p_id", "p_ts", "revenue")
