"""Registry-wide physical-plan scale contract (VERDICT r9 task #3).

Every query in the registry is planned at sf0.001 and checked against
``plancheck.plan_violations``: no CartesianProduct, no row-at-a-time
Python (BatchEvalPython), and every ``Exchange SinglePartition`` fed by a
bounded subtree (aggregate / limit / two-phase-prune on the path to any
file scan). This mechanizes the discipline behind the r8/r9 weak-item
fixes (`curriculum_order`, `hybrid_rrf_search`, `pr_auc_eval`) so the
class of defect cannot silently return with a future query.

Planning only — no query is executed — so the whole registry sweeps in
about the cost of analysis+optimization per query. AQE never introduces
the banned shapes, so the initial plan is sufficient evidence.
"""

from __future__ import annotations

from batch_processing_pipeline_spark.plancheck import (
    WHITELIST,
    plan_violations,
    unbounded_single_partition_exchanges,
)

SF = "/root/testdata/sf0.001"


def test_registry_wide_scale_contract(spark):
    from batch_processing_pipeline_spark.registry import QUERIES

    bad: dict[str, list[str]] = {}
    for name in sorted(QUERIES):
        if name in WHITELIST:
            continue
        df = QUERIES[name](spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        v = plan_violations(plan)
        if v:
            bad[name] = v
    assert not bad, f"scale-contract violations in {len(bad)} queries: {bad}"


def test_whitelist_entries_still_exist_and_still_flag(spark):
    """A whitelist row must stay honest: the query still exists, and it
    still trips the contract (otherwise the row is stale and should go)."""
    from batch_processing_pipeline_spark.registry import QUERIES

    for name in WHITELIST:
        df = QUERIES[name](spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan_violations(plan), f"{name} no longer violates — drop it"


# ---- parser unit tests on synthetic plan strings ----

_BAD = """AdaptiveSparkPlan isFinalPlan=false
+- Window [row_number() windowspecdefinition(v DESC)], [v DESC]
   +- Sort [v DESC NULLS LAST], false, 0
      +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=5]
         +- Project [v]
            +- FileScan parquet [v] Batched: true
"""

_GOOD_AGG = """AdaptiveSparkPlan isFinalPlan=false
+- Window [sum(c)], [g ASC]
   +- Sort [g ASC NULLS FIRST], false, 0
      +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=9]
         +- HashAggregate(keys=[g], functions=[count(1)])
            +- Exchange hashpartitioning(g, 32), [plan_id=7]
               +- HashAggregate(keys=[g], functions=[partial_count(1)])
                  +- FileScan parquet [g] Batched: true
"""

_GOOD_PRUNE = """AdaptiveSparkPlan isFinalPlan=false
+- Window [row_number()], [v DESC]
   +- Sort [v DESC], false, 0
      +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=4]
         +- Filter ((_mid & 8589934591) < 20)
            +- Project [v, monotonically_increasing_id() AS _mid]
               +- Sort [v DESC], false, 0
                  +- FileScan parquet [v] Batched: true
"""

_MIXED = """AdaptiveSparkPlan isFinalPlan=false
+- SortMergeJoin [a], [b], Inner
   :- Exchange SinglePartition, [plan_id=2]
   :  +- HashAggregate(keys=[a], functions=[count(1)])
   :     +- FileScan parquet [a]
   +- Exchange SinglePartition, [plan_id=3]
      +- Project [b]
         +- FileScan parquet [b]
"""


def test_plancheck_flags_unbounded_scan():
    assert unbounded_single_partition_exchanges(_BAD)
    assert any("FileScan" in v for v in plan_violations(_BAD))


def test_plancheck_accepts_aggregate_and_prune():
    assert plan_violations(_GOOD_AGG) == []
    assert plan_violations(_GOOD_PRUNE) == []


def test_plancheck_per_path_not_per_subtree():
    """Sibling branches are judged independently: the aggregated branch
    passes, the raw branch is still flagged."""
    v = unbounded_single_partition_exchanges(_MIXED)
    assert len(v) == 1 and "[b]" in v[0]


def test_plancheck_flags_cartesian_and_python():
    assert "CartesianProduct" in plan_violations("+- CartesianProduct\n")[0]
    assert any(
        "BatchEvalPython" in x for x in plan_violations("+- BatchEvalPython [f(x)]\n")
    )


def test_plancheck_engages_on_real_final_adaptive_plans(spark):
    """Guard the indent grammar against AQE output drift: on an EXECUTED
    plan (isFinalPlan=true, stages reprinted) the parser must still see
    real tree depth, and on a query that legitimately contains
    single-partition exchanges (curriculum_order's P-row offsets window)
    it must find them AND judge them bounded — i.e. the bounded-path
    logic demonstrably engaged on a production plan, not only on the
    synthetic fixtures above."""
    from batch_processing_pipeline_spark import plancheck
    from batch_processing_pipeline_spark.registry import QUERIES

    df = QUERIES["curriculum_order"](spark, SF)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "Exchange SinglePartition" in plan  # the query's P-row windows
    nodes = plancheck._parse(plan)
    assert max(d for d, _ in nodes) >= 4  # grammar still sees the tree
    assert plan_violations(plan) == []


def test_row_key_aggregate_does_not_bound(spark):
    """Round-11: the documented blind spot is closed — an aggregate whose
    grouping key is a row identifier (one output row per input row) must
    NOT count as a bounding node, so a planted groupBy(doc_id) feeding a
    global unpartitioned window goes red. The dimension-keyed twin
    (groupBy(lang)) stays green, as does a global agg (keys=[])."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    w = Window.orderBy(F.desc("n"))

    planted = (
        docs.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("rk", F.row_number().over(w))
    )
    plan = planted._jdf.queryExecution().executedPlan().toString()
    assert unbounded_single_partition_exchanges(plan), plan[:1500]

    dim = (
        docs.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("rk", F.row_number().over(w))
    )
    plan = dim._jdf.queryExecution().executedPlan().toString()
    assert not unbounded_single_partition_exchanges(plan), plan[:1500]

    glob = (
        docs.agg(F.count(F.lit(1)).alias("n"))
        .withColumn("rk", F.row_number().over(Window.orderBy("n")))
    )
    plan = glob._jdf.queryExecution().executedPlan().toString()
    assert not unbounded_single_partition_exchanges(plan), plan[:1500]


def test_fixed_dim_key_aggregate_still_bounds(spark):
    """nation/region keys are key-suffixed but fixed-cardinality (25/5
    at every SF) — an aggregate grouped by them must still bound."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    nat = spark.read.parquet(f"{SF}/lineitem.parquet").join(
        spark.read.parquet(f"{SF}/orders.parquet"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    agg = (
        nat.groupBy("o_orderpriority")
        .agg(F.sum("l_quantity").alias("q"))
        .withColumn("rk", F.row_number().over(Window.orderBy(F.desc("q"))))
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert not unbounded_single_partition_exchanges(plan), plan[:1500]

    cust = spark.read.parquet(f"{SF}/customer.parquet")
    nation_agg = (
        cust.groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("rk", F.row_number().over(Window.orderBy(F.desc("n"))))
    )
    plan = nation_agg._jdf.queryExecution().executedPlan().toString()
    assert not unbounded_single_partition_exchanges(plan), plan[:1500]

    # and the corpus-scaling TPC-H identifier: custkey agg must NOT bound
    bad = (
        cust.groupBy("c_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("rk", F.row_number().over(Window.orderBy(F.desc("n"))))
    )
    plan = bad._jdf.queryExecution().executedPlan().toString()
    assert unbounded_single_partition_exchanges(plan), plan[:1500]


def test_pinned_corpus_checkpoint_is_a_corpus_leaf(spark):
    """Round-12 (ADVICE r11): the rank family's localCheckpoint pin made
    corpus relations surface as `Scan ExistingRDD`, which the sweep
    deliberately ignores for literal relations — a checkpointed CORPUS
    fed straight into a single-partition exchange slipped past. The pin
    now stamps a plan-visible `__pinned_corpus__` marker column into the
    checkpoint (ExistingRDD scans don't prune, so it always shows), and
    plancheck counts marker-bearing RDD scans as corpus leaves. Planted
    negative: a pinned corpus under a global unpartitioned window goes
    red; the rank helpers' own plans (offsets bounded by per-partition
    aggregation) stay green — asserted on a production caller."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from batch_processing_pipeline_spark.operators.rank import (
        _pinned_range_partitions,
        exact_global_rank,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    pinned = _pinned_range_partitions(docs, [F.asc("doc_id")], 4)
    planted = pinned.withColumn(
        "rk", F.row_number().over(Window.orderBy(F.desc("n_chars")))
    )
    plan = planted._jdf.queryExecution().executedPlan().toString()
    assert "__pinned_corpus__" in plan, plan[:1500]
    assert unbounded_single_partition_exchanges(plan), plan[:1500]

    # the production shape stays green: exact_global_rank's offsets
    # exchange is bounded by the per-partition aggregate
    ranked = exact_global_rank(
        docs, [F.desc("n_chars"), F.asc("doc_id")], num_partitions=4
    )
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    assert not unbounded_single_partition_exchanges(plan), plan[:2000]
