"""TPC-H suite: plan shapes + non-vacuity.

Value correctness is the oracle harness's job (tools/check_oracle.py runs
every tpch_* query against DuckDB); these tests pin the PHYSICAL plans —
the properties that decide whether the same query survives 100 TB — and
that each query actually selects rows at smoke scale (a filter calibrated
to miss the fixture would make the oracle match vacuously).
"""

from __future__ import annotations

import pytest

from batch_processing_pipeline_spark.plans.tpch import TPCH_QUERIES
from batch_processing_pipeline_spark.registry import QUERIES


def _plan(spark, sf_dir, name):
    return QUERIES[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()


def test_all_tpch_queries_registered():
    assert set(TPCH_QUERIES) <= set(QUERIES)
    assert len(TPCH_QUERIES) == 22


def test_q1_filter_pushed_and_partial_agg(spark, sf_dir):
    plan = _plan(spark, sf_dir, "tpch_q1")
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:200]
    # map-side combine: partial + final HashAggregate around one exchange
    assert plan.count("HashAggregate") >= 2


def test_q3_predicates_reach_all_three_scans(spark, sf_dir):
    plan = _plan(spark, sf_dir, "tpch_q3")
    pushed = [seg[:200] for seg in plan.split("PushedFilters")[1:]]
    hits = "".join(pushed)
    assert "c_mktsegment" in hits and "o_orderdate" in hits and "l_shipdate" in hits


def test_q5_broadcasts_constant_dims(spark, sf_dir):
    # nation + region are hard-broadcast; bigger tables are planner's call
    assert _plan(spark, sf_dir, "tpch_q5").count("BroadcastHashJoin") >= 2


def test_q4_exists_is_semi_join(spark, sf_dir):
    assert "LeftSemi" in _plan(spark, sf_dir, "tpch_q4")


def test_q22_not_exists_is_anti_join(spark, sf_dir):
    assert "LeftAnti" in _plan(spark, sf_dir, "tpch_q22")


def test_q6_is_scan_side_only(spark, sf_dir):
    plan = _plan(spark, sf_dir, "tpch_q6")
    assert "Join" not in plan
    assert "PushedFilters: [" in plan


def test_q19_extracts_equi_key_from_disjunction(spark, sf_dir):
    # the OR-of-branches must not force a cartesian product
    plan = _plan(spark, sf_dir, "tpch_q19")
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_partsupp_derivation_needs_no_data_shuffle(spark, sf_dir):
    # partsupp is derived map-side: the only exchanges allowed are the
    # SinglePartition one under the 1-row supplier count — never a
    # hash-partitioned shuffle of the part rows themselves.
    from batch_processing_pipeline_spark.plans.tpch import derived_partsupp

    plan = (
        derived_partsupp(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    )
    assert "hashpartitioning" not in plan


def test_partsupp_four_distinct_suppliers_per_part(spark, sf_dir):
    from batch_processing_pipeline_spark.plans.tpch import derived_partsupp

    from pyspark.sql import functions as F

    bad = (
        derived_partsupp(spark, sf_dir)
        .groupBy("ps_partkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("ps_suppkey").alias("nd"),
        )
        .where((F.col("n") != 4) | (F.col("nd") != 4))
        .count()
    )
    assert bad == 0


def test_q2_broadcasts_constant_dims(spark, sf_dir):
    assert _plan(spark, sf_dir, "tpch_q2").count("BroadcastHashJoin") >= 2


def test_q11_threshold_is_broadcast_single_row(spark, sf_dir):
    # the total-value threshold joins back as a broadcast nested loop of
    # one row — no driver collect, no rescan of the aggregate input
    assert "BroadcastNestedLoopJoin" in _plan(spark, sf_dir, "tpch_q11")


def test_q16_supplier_exclusion_is_anti_join(spark, sf_dir):
    assert "LeftAnti" in _plan(spark, sf_dir, "tpch_q16")


def test_q20_keeps_suppliers_via_semi_join(spark, sf_dir):
    assert "LeftSemi" in _plan(spark, sf_dir, "tpch_q20")


def test_q21_has_both_semi_and_anti_probe(spark, sf_dir):
    plan = _plan(spark, sf_dir, "tpch_q21")
    assert "LeftSemi" in plan and "LeftAnti" in plan


def test_no_python_row_processing(spark, sf_dir):
    for name in TPCH_QUERIES:
        plan = _plan(spark, sf_dir, name)
        assert "BatchEvalPython" not in plan, name
        assert "MapInPandas" not in plan, name


@pytest.mark.parametrize("name", sorted(TPCH_QUERIES))
def test_non_vacuous_at_smoke_scale(spark, name):
    # sf0.01: the scale the oracle harness compares at. A query whose
    # predicates select nothing would "match" trivially — reject that.
    assert QUERIES[name](spark, "/root/testdata/sf0.01").limit(1).count() == 1, name
