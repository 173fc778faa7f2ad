"""Property-based tests for the incremental merge (hypothesis)."""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from batch_processing_pipeline_spark.operators.merge import merge_frequencies

SCHEMA = "prefix string, query string, frequency long"


def _agg(rows):
    c = Counter()
    for p, q, f in rows:
        c[(p, q)] += f
    return [(p, q, f) for (p, q), f in c.items()]


def _df(spark, rows):
    if not rows:
        return spark.createDataFrame([], SCHEMA)
    return spark.createDataFrame(rows, SCHEMA)


def _collect(df):
    return {(r.prefix, r.query): r.frequency for r in df.collect()}


@settings(max_examples=10, deadline=None)
@given(
    a=st.lists(
        st.tuples(
            st.sampled_from(["aa", "ab"]),
            st.sampled_from(["aaa", "abb"]),
            st.integers(min_value=1, max_value=50),
        ),
        max_size=6,
    ),
    b=st.lists(
        st.tuples(
            st.sampled_from(["aa", "ba"]),
            st.sampled_from(["aaa", "bab"]),
            st.integers(min_value=1, max_value=50),
        ),
        max_size=6,
    ),
)
def test_merge_matches_counter_semantics(a, b):
    from batch_processing_pipeline_spark import get_spark

    spark = get_spark("bpp-tests")  # reuses the fixture session
    ra, rb = _agg(a), _agg(b)
    got = _collect(merge_frequencies(_df(spark, ra), _df(spark, rb)))
    expected = Counter(dict(((p, q), f) for p, q, f in ra))
    expected.update(dict(((p, q), f) for p, q, f in rb))
    assert got == {k: v for k, v in expected.items()}


def test_merge_with_none_and_empty(spark):
    rows = [("aa", "aaa", 3)]
    assert _collect(merge_frequencies(None, _df(spark, rows))) == {("aa", "aaa"): 3}
    assert _collect(merge_frequencies(_df(spark, []), _df(spark, rows))) == {
        ("aa", "aaa"): 3
    }


@settings(max_examples=5, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["aa", "ab", "ba", "bb", "ca"]),
            st.sampled_from(["aardvark", "abacus", "banana", "cart"]),
            st.integers(min_value=1, max_value=9),
        ),
        min_size=0,
        max_size=20,
    ),
    n_batches=st.integers(min_value=1, max_value=3),
)
def test_bucketed_state_batch_split_invariance(rows, n_batches, spark, tmp_path_factory):
    """Merging ANY split of the input through the bucketed state store
    equals one global aggregate — same invariance the flat merge holds,
    now through touched-bucket partition overwrites and replay stamps."""
    import shutil

    from batch_processing_pipeline_spark.operators.state_store import (
        merge_touched_buckets,
        read_bucketed_state,
    )

    state_dir = str(tmp_path_factory.mktemp("bucketed") / "state")
    try:
        for i in range(n_batches):
            chunk = rows[i::n_batches]
            delta = _df(spark, _agg(chunk))
            merge_touched_buckets(spark, delta, state_dir, batch_id=i, buckets=4)
        import os

        if not os.path.exists(state_dir):
            assert not rows
            return
        got = {
            (r.prefix, r.query): r.frequency
            for r in read_bucketed_state(spark, state_dir).collect()
        }
        assert got == {(p, q): f for p, q, f in _agg(rows)}
        # replaying the last batch must change nothing (per-bucket stamps)
        last = _df(spark, _agg(rows[(n_batches - 1) :: n_batches]))
        merge_touched_buckets(
            spark, last, state_dir, batch_id=n_batches - 1, buckets=4
        )
        again = {
            (r.prefix, r.query): r.frequency
            for r in read_bucketed_state(spark, state_dir).collect()
        }
        assert again == got
    finally:
        shutil.rmtree(state_dir, ignore_errors=True)


def test_known_stamps_cache_equivalence_and_replay_safety(spark, tmp_path_factory):
    """Round-13 replay-stamp cache (merge_touched_buckets ``known_stamps``):
    a caller-owned per-run {bucket: stamp} dict lets steady-state triggers
    skip the per-trigger stamp-check job. Pinned here:

    * state after N batches is identical with and without the cache;
    * a replay WITHIN a run (same dict) is skipped via the cache;
    * a replay after a RESTART (fresh dict) is skipped via the disk check;
    * the cross-lineage corner: a fresh run whose early batches never
      touch a stale-stamped bucket must still skip that bucket when a
      later batch reaches it (unknown buckets are always disk-checked).
    """
    import shutil

    from pyspark.sql import functions as F

    from batch_processing_pipeline_spark.operators.state_store import (
        merge_touched_buckets,
        read_bucketed_state,
        state_bucket,
    )

    def bucket_of(prefix: str) -> int:
        return (
            spark.createDataFrame([(prefix,)], "prefix string")
            .select(state_bucket("prefix", 4).alias("b"))
            .collect()[0]
            .b
        )

    # two prefixes guaranteed to live in different buckets
    cands = ["aa", "ab", "ba", "bb", "ca", "cb", "da"]
    by_bucket: dict[int, str] = {}
    for p in cands:
        by_bucket.setdefault(bucket_of(p), p)
        if len(by_bucket) >= 2:
            break
    (b1, p1), (b2, p2) = list(by_bucket.items())[:2]

    batches = [
        [(p1, p1 + "x", 3)],
        [(p2, p2 + "y", 5)],
        [(p1, p1 + "x", 2), (p2, p2 + "z", 1)],
    ]

    def run(state_dir, stamps):
        for i, rows in enumerate(batches):
            merge_touched_buckets(
                spark,
                _df(spark, rows),
                state_dir,
                batch_id=i,
                buckets=4,
                known_stamps=stamps,
            )

    base = tmp_path_factory.mktemp("stamps")
    dir_cached, dir_plain = str(base / "cached"), str(base / "plain")
    try:
        stamps: dict[int, int] = {}
        run(dir_cached, stamps)
        run(dir_plain, None)
        got_cached = _collect(read_bucketed_state(spark, dir_cached))
        got_plain = _collect(read_bucketed_state(spark, dir_plain))
        assert got_cached == got_plain
        # the cache recorded the last batch id that wrote each bucket
        assert stamps == {b1: 2, b2: 2}

        # replay WITHIN the run: same dict, stamp >= batch_id -> skipped
        merge_touched_buckets(
            spark, _df(spark, batches[2]), dir_cached, batch_id=2,
            buckets=4, known_stamps=stamps,
        )
        assert _collect(read_bucketed_state(spark, dir_cached)) == got_cached

        # replay after RESTART: fresh dict, the disk check must skip it
        fresh: dict[int, int] = {}
        merge_touched_buckets(
            spark, _df(spark, batches[2]), dir_cached, batch_id=2,
            buckets=4, known_stamps=fresh,
        )
        assert _collect(read_bucketed_state(spark, dir_cached)) == got_cached
        assert fresh[b1] >= 2 and fresh[b2] >= 2  # learned from disk

        # cross-lineage corner: fresh checkpoint restarts ids at 0 while
        # bucket b2 is stamped 2. A new run merges batch 0 into b1 ONLY
        # (learns nothing about b2), then batch 1 reaches b2 -> unknown ->
        # disk-checked -> skipped (no double count).
        lineage2: dict[int, int] = {}
        merge_touched_buckets(
            spark, _df(spark, [(p1, p1 + "q", 7)]), dir_cached, batch_id=0,
            buckets=4, known_stamps=lineage2,
        )
        merge_touched_buckets(
            spark, _df(spark, [(p2, p2 + "y", 5)]), dir_cached, batch_id=1,
            buckets=4, known_stamps=lineage2,
        )
        after = _collect(read_bucketed_state(spark, dir_cached))
        # b1's batch-0 merge also replays into a stamp-2 bucket -> skipped;
        # b2's batch-1 delta must NOT have double-counted (stamp 2 >= 1)
        assert after == got_cached
    finally:
        shutil.rmtree(dir_cached, ignore_errors=True)
        shutil.rmtree(dir_plain, ignore_errors=True)
