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
