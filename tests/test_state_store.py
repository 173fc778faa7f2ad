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
