"""Bucketed (SMB) join: the shuffle really is eliminated, and the result
matches the plain (shuffling) join bit-for-bit."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from batch_processing_pipeline_spark.operators.bucketed import (
    bucketed_join,
    write_bucketed,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("smb")
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").select(
        F.col("o_orderkey").alias("okey"), "o_orderpriority"
    )
    l = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").select(
        F.col("l_orderkey").alias("okey"), "l_quantity"
    )
    write_bucketed(o, "t_smb_orders", str(base / "o"), ["okey"], 4,
                   sort_cols=["okey"])
    write_bucketed(l, "t_smb_lineitem", str(base / "l"), ["okey"], 4,
                   sort_cols=["okey"])
    yield o, l
    spark.sql("DROP TABLE IF EXISTS t_smb_orders")
    spark.sql("DROP TABLE IF EXISTS t_smb_lineitem")


def test_no_exchange_in_bucketed_join(spark, bucketed_tables):
    """With broadcast disabled (so the planner can't skip SMJ), the bucketed
    join's physical plan has NO Exchange on either side: bucket i streams
    against bucket i."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, "t_smb_orders", "t_smb_lineitem", ["okey"])
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    o, l = bucketed_tables
    got = (
        bucketed_join(spark, "t_smb_orders", "t_smb_lineitem", ["okey"])
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("q"))
    )
    want = (
        o.join(l, "okey")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("q"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_bucketed_agg_skips_shuffle(spark, bucketed_tables):
    """groupBy on the bucketing key also needs no Exchange — bucket files
    already co-locate each key."""
    agg = spark.table("t_smb_lineitem").groupBy("okey").agg(
        F.sum("l_quantity").alias("q")
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_write_is_idempotent(spark, bucketed_tables, tmp_path):
    """Re-writing the same table name (new path) replaces it cleanly —
    repeated driver runs in one session must not fail or double data."""
    o, _ = bucketed_tables
    write_bucketed(o, "t_smb_orders2", str(tmp_path / "o2"), ["okey"], 4)
    write_bucketed(o, "t_smb_orders2", str(tmp_path / "o2"), ["okey"], 4)
    assert spark.table("t_smb_orders2").count() == o.count()
    spark.sql("DROP TABLE IF EXISTS t_smb_orders2")
