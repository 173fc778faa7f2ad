"""Curation pipeline: filter + dedup semantics on a controlled corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from batch_processing_pipeline_spark.plans.curation import curate, curation_report

DOCS = [
    (0, "the project ships a complete data engine with tested operators and clear docs " * 3),
    (1, "the project ships a complete data engine with tested operators and clear docs " * 3),  # dup of 0
    (2, "!!! ??? ###"),  # junk → filtered by quality
    (3, "el perro es un animal que vive en la casa con nosotros y es muy bueno " * 3),
]


def test_curate_filters_and_dedups(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r.doc_id: r for r in curate(df, min_quality=0.5).collect()}
    assert set(got) == {0, 3}          # 1 deduped into 0, 2 filtered
    assert got[0].dup_count == 2
    assert got[3].lang_pred == "es"
    assert got[0].lang_pred == "en"
    assert got[0].ws_tokens > 0


def test_curation_report_accounts_tokens(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rep = {
        r.lang_pred: r
        for r in curation_report(curate(df, min_quality=0.5)).collect()
    }
    assert rep["en"].docs == 1
    assert rep["es"].docs == 1
    assert rep["en"].total_ws_tokens == len(DOCS[0][1].split())
