"""End-to-end autocomplete pipeline golden tests (SURVEY §5.2 item 3).

Fixtures replicate the reference's own sample inputs
(``/root/reference/input-data/sample.txt`` shape: test/test/kheder/kheder/
goodmorning) and assert the H1 fix: two-batch cumulative merge counts each
batch exactly once, and re-deriving suggestions from materialized state is
idempotent.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from batch_processing_pipeline_spark.operators.merge import merge_frequencies
from batch_processing_pipeline_spark.plans.autocomplete import (
    autocomplete_batch,
    run_incremental_batch,
    suggestions,
)

SAMPLE = [("Test ",), ("test",), ("kheder",), ("kheder",), ("goodmorning",)]


def _raw(spark, rows=SAMPLE):
    return spark.createDataFrame(rows, "value string")


def test_single_batch_golden(spark):
    merged, sugg = autocomplete_batch(_raw(spark), None, k=10)
    freq = {(r.prefix, r.query): r.frequency for r in merged.collect()}
    assert freq[("te", "test")] == 2
    assert freq[("kh", "kheder")] == 2
    assert freq[("goodmorning", "goodmorning")] == 1
    got = {r.prefix: json.loads(r.completions_json) for r in sugg.collect()}
    assert got["te"] == ["test"]
    assert got["go"] == ["goodmorning"]


def test_two_batches_accumulate_once(spark):
    """H1: the second batch adds new counts exactly once."""
    b1, _ = autocomplete_batch(_raw(spark), None)
    merged2, _ = autocomplete_batch(_raw(spark), b1)
    freq = {(r.prefix, r.query): r.frequency for r in merged2.collect()}
    assert freq[("te", "test")] == 4  # 2 per batch — not 6 (the reference bug)


def test_merge_carries_forward_absent_prefixes(spark):
    state = spark.createDataFrame(
        [("old", "oldquery", 7)], "prefix string, query string, frequency long"
    )
    new = spark.createDataFrame(
        [("ne", "new", 1)], "prefix string, query string, frequency long"
    )
    merged = {(r.prefix, r.query): r.frequency for r in merge_frequencies(state, new).collect()}
    assert merged[("old", "oldquery")] == 7
    assert merged[("ne", "new")] == 1


def test_topk_orders_by_freq_then_query(spark):
    rows = [("aa x",), ("aa x",), ("aa y",), ("aa y",), ("aa a",)]
    merged, sugg = autocomplete_batch(spark.createDataFrame(rows, "value string"), None, k=2)
    got = {r.prefix: r.completions for r in sugg.collect()}
    # freq: "aa x"=2, "aa y"=2, "aa a"=1 → tie between x/y broken by query asc
    assert got["aa"] == ["aa x", "aa y"]


def test_run_incremental_batch_stage_then_swap(spark, tmp_path):
    """Materialized-state runner: state written once, suggestions derived
    from the materialized copy, second batch reads first batch's output."""
    out1 = str(tmp_path / "state1")
    sug1 = str(tmp_path / "sugg1")
    run_incremental_batch(_raw(spark), None, out1, sug1, k=10)
    s1 = spark.read.parquet(out1)
    assert {(r.prefix, r.query): r.frequency for r in s1.collect()}[("te", "test")] == 2

    out2 = str(tmp_path / "state2")
    sug2 = str(tmp_path / "sugg2")
    run_incremental_batch(_raw(spark), out1, out2, sug2, k=10)
    s2 = spark.read.parquet(out2)
    assert {(r.prefix, r.query): r.frequency for r in s2.collect()}[("te", "test")] == 4
    sg = {r.prefix: r.completions for r in spark.read.parquet(sug2).collect()}
    assert sg["te"] == ["test"]


def test_suggestions_completions_json_roundtrip(spark):
    freq = spark.createDataFrame(
        [("ab", "abc", 3), ("ab", "abd", 1)],
        "prefix string, query string, frequency long",
    )
    row = suggestions(freq, k=10).collect()[0]
    assert json.loads(row.completions_json) == list(row.completions) == ["abc", "abd"]
