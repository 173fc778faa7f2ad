"""Bucketed state store: join-merge equivalence + no state-side shuffle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from batch_processing_pipeline_spark.operators.merge import merge_frequencies
from batch_processing_pipeline_spark.operators.state_store import (
    merge_frequencies_join,
    run_bucketed_batch,
    save_state_bucketed,
)

STATE = [("ab", "abc", 5), ("ab", "abd", 2), ("xy", "xyz", 7)]
DELTA = [("ab", "abc", 1), ("ne", "new", 3)]
SCHEMA = "prefix string, query string, frequency long"


def test_join_merge_equals_union_merge(spark):
    state = spark.createDataFrame(STATE, SCHEMA)
    delta = spark.createDataFrame(DELTA, SCHEMA)
    via_join = {
        (r.prefix, r.query): r.frequency
        for r in merge_frequencies_join(state, delta).collect()
    }
    via_union = {
        (r.prefix, r.query): r.frequency
        for r in merge_frequencies(state, delta).collect()
    }
    assert via_join == via_union
    assert via_join[("ab", "abc")] == 6  # merged
    assert via_join[("xy", "xyz")] == 7  # carried forward
    assert via_join[("ne", "new")] == 3  # brand new


def test_bucketed_state_two_batches(spark, tmp_path):
    delta = spark.createDataFrame(DELTA, SCHEMA)
    run_bucketed_batch(spark, delta, "state_b0", "state_b1", buckets=4)
    merged = run_bucketed_batch(spark, delta, "state_b1", "state_b2", buckets=4)
    got = {(r.prefix, r.query): r.frequency for r in merged.collect()}
    assert got[("ab", "abc")] == 2
    assert got[("ne", "new")] == 6
    spark.sql("DROP TABLE IF EXISTS state_b1")
    spark.sql("DROP TABLE IF EXISTS state_b2")


def test_bucketed_state_side_avoids_exchange(spark, tmp_path):
    """The point of bucketing: the (huge) state side of the merge join must
    NOT reshuffle; only the delta side gets an Exchange."""
    state = spark.createDataFrame(STATE, SCHEMA)
    save_state_bucketed(state, "state_plan_t", buckets=4)
    delta = spark.createDataFrame(DELTA, SCHEMA)
    merged = merge_frequencies_join(spark.table("state_plan_t"), delta)
    plan = merged._jdf.queryExecution().executedPlan().toString()
    try:
        assert plan.count("Exchange hashpartitioning") == 1, plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    finally:
        spark.sql("DROP TABLE IF EXISTS state_plan_t")


def test_in_place_overwrite_rejected(spark, tmp_path):
    """out_table == state_table would overwrite state the lazy merged plan
    still reads — must be refused."""
    import pytest

    from batch_processing_pipeline_spark.operators.state_store import run_bucketed_batch

    delta = spark.createDataFrame(
        [("th", "the", 1)], "prefix string, query string, frequency long"
    )
    with pytest.raises(ValueError, match="stage-then-swap"):
        run_bucketed_batch(spark, delta, "acc_state", "acc_state")


def test_merge_aggregates_kinds_and_first_batch(spark):
    from batch_processing_pipeline_spark.operators.state_store import (
        merge_aggregates,
    )

    b1 = spark.createDataFrame(
        [("a", 2, 5.0, 1.0, 4.0, 10.0, 100, 1)],
        "k string, n long, sv double, mn double, mx double, lv double, ts long, id long",
    )
    b2 = spark.createDataFrame(
        [
            ("a", 3, 7.0, 0.5, 3.0, 20.0, 100, 2),  # same ts: id breaks tie
            ("b", 1, 1.0, 9.0, 9.0, 30.0, 50, 3),   # key only in delta
        ],
        "k string, n long, sv double, mn double, mx double, lv double, ts long, id long",
    )
    first = merge_aggregates(None, b1, keys=["k"])
    assert first.collect() == b1.collect()
    merged = {
        r.k: r
        for r in merge_aggregates(
            b1, b2, keys=["k"], sums=("n", "sv"), mins=("mn",), maxs=("mx",),
            latest=("lv",), ts_col="ts", id_col="id",
        ).collect()
    }
    a = merged["a"]
    assert (a.n, a.sv, a.mn, a.mx) == (5, 12.0, 0.5, 4.0)
    assert a.lv == 20.0  # equal ts -> higher id wins
    b = merged["b"]
    assert (b.n, b.sv, b.mn, b.mx, b.lv) == (1, 1.0, 9.0, 9.0, 30.0)
    # merge is order-independent (commutativity)
    swapped = {
        r.k: r
        for r in merge_aggregates(
            b2, b1, keys=["k"], sums=("n", "sv"), mins=("mn",), maxs=("mx",),
            latest=("lv",), ts_col="ts", id_col="id",
        ).collect()
    }
    assert swapped["a"].lv == 20.0 and swapped["a"].n == 5
