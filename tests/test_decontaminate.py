"""Benchmark decontamination: cross-set n-gram overlap removal."""

from __future__ import annotations

from pyspark.sql import functions as F

from batch_processing_pipeline_spark.operators.decontaminate import (
    contamination_report,
    decontaminate,
)


def _sets(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "a completely unrelated document about spark engines"),
            (3, "short"),
            (4, "this one quotes the quick brown fox jumps verbatim in passing"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "quick brown fox jumps over")], "doc_id long, text string"
    )
    return corpus, bench


def test_decontaminate_drops_overlapping_docs(spark):
    corpus, bench = _sets(spark)
    kept = {r.doc_id for r in decontaminate(corpus, bench, ngram=20).collect()}
    # 1 and 4 share a 20-char window with the benchmark; 3 is shorter than
    # the n-gram and must survive by definition
    assert kept == {2, 3}


def test_contamination_report_counts_hits(spark):
    corpus, bench = _sets(spark)
    rep = {r.doc_id: r.n_hits for r in contamination_report(corpus, bench, ngram=20).collect()}
    assert set(rep) == {1, 4}
    assert all(n >= 1 for n in rep.values())


def test_benchmark_side_broadcasts(spark):
    """The eval set is the small side — its hash set must broadcast so the
    corpus probe stays map-side (no corpus shuffle before the semi-join)."""
    corpus, bench = _sets(spark)
    plan = (
        decontaminate(corpus, bench, ngram=20)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
