"""Prefix fan-out: unit + property tests (SURVEY §5.2 items 1 and 4)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from batch_processing_pipeline_spark.operators.prefix import (
    expand_prefixes,
    normalize_queries,
    prefix_frequencies,
)


def test_normalize_drops_blank_and_short(spark):
    raw = spark.createDataFrame(
        [("  Hello World  ",), ("",), ("x",), ("  ",), (None,), ("AB",)],
        "value string",
    )
    got = [r.query for r in normalize_queries(raw).collect()]
    assert sorted(got) == ["ab", "hello world"]


def test_normalize_caps_query_length(spark):
    raw = spark.createDataFrame([("a" * 600,)], "value string")
    got = normalize_queries(raw).collect()[0].query
    assert len(got) == 500


def test_expand_prefixes_exact(spark):
    df = spark.createDataFrame([("test",)], "query string")
    got = sorted(r.prefix for r in expand_prefixes(df).collect())
    assert got == ["te", "tes", "test"]


def test_expand_prefixes_cap_at_60(spark):
    df = spark.createDataFrame([("q" * 80,)], "query string")
    got = [r.prefix for r in expand_prefixes(df).collect()]
    assert len(got) == 59  # L = 2..60
    assert max(len(p) for p in got) == 60


def test_prefix_frequencies_counts_duplicates(spark):
    # the reference's own sample.txt shape: duplicates are a frequency test
    df = spark.createDataFrame(
        [("test",), ("test",), ("kheder",), ("kheder",), ("goodmorning",)],
        "query string",
    )
    freq = {(r.prefix, r.query): r.frequency for r in prefix_frequencies(df).collect()}
    assert freq[("te", "test")] == 2
    assert freq[("kheder", "kheder")] == 2
    assert freq[("go", "goodmorning")] == 1


@settings(max_examples=20, deadline=None)
@given(st.text(min_size=0, max_size=100))
def test_prefix_count_property(q):
    """#prefixes == max(0, min(len, 60) - 1); every prefix is a true prefix."""
    # driver-side check against a shared session created by the fixture chain
    from batch_processing_pipeline_spark import get_spark

    spark = get_spark("bpp-tests")  # reuses the active session
    df = spark.createDataFrame([(q,)], "query string")
    rows = expand_prefixes(df).collect()
    expected = max(0, min(len(q), 60) - 1)
    assert len(rows) == expected
    for r in rows:
        assert q.startswith(r.prefix)
        assert 2 <= len(r.prefix) <= 60


def test_fanout_has_no_rdd_or_udf_in_plan(spark):
    """The fan-out must stay inside Catalyst (no RDD/Python hops)."""
    df = spark.createDataFrame([("hello",)], "query string")
    plan = expand_prefixes(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "Generate explode" in plan or "Generate" in plan
