"""TF-IDF: hand-computed golden values + scale-shape assertion."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from batch_processing_pipeline_spark.functions.tfidf import tfidf


def test_tfidf_golden(spark):
    docs = [
        (0, "spark spark engine"),
        (1, "spark parquet"),
        (2, "engine room"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {(r.doc_id, r.word): (r.tf, r.tfidf) for r in tfidf(df).collect()}
    n = 3

    def idf(dfreq):
        return math.log((1 + n) / (1 + dfreq)) + 1

    assert got[(0, "spark")][0] == 2
    assert abs(got[(0, "spark")][1] - 2 * idf(2)) < 1e-9
    assert abs(got[(2, "room")][1] - 1 * idf(1)) < 1e-9
    # a term in every doc would have idf = log(4/4)+1 = 1 exactly
    assert abs(got[(1, "parquet")][1] - idf(1)) < 1e-9


def test_tfidf_uses_broadcast_for_df_and_n(spark):
    df = spark.createDataFrame([(0, "a b"), (1, "b c")], "doc_id long, text string")
    plan = tfidf(df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan  # docfreq + N join as broadcasts
