from __future__ import annotations

from pyspark.sql import functions as F

from batch_processing_pipeline_spark.functions.pii import pii_counts, scrub_pii
from batch_processing_pipeline_spark.functions.text_analysis import word_ngram_counts


def _one(spark, s: str):
    return spark.createDataFrame([(s,)], ["t"])


def test_scrub_pii_golden(spark):
    raw = (
        "mail jane.doe+x@corp.example.org, ssn 123-45-6789, "
        "host 192.168.0.1, call +31 (0)20 123-4567 now"
    )
    got = _one(spark, raw).select(scrub_pii(F.col("t")).alias("s")).first().s
    assert got == "mail <EMAIL>, ssn <SSN>, host <IP>, call <PHONE> now"


def test_scrub_pii_leaves_clean_text_alone(spark):
    raw = "release v2.10.3 shipped on 2024-05-01 at 10.5 percent margin"
    got = _one(spark, raw).select(scrub_pii(F.col("t")).alias("s")).first().s
    assert got == raw


def test_pii_counts(spark):
    raw = "a@b.co c@d.org and 10.0.0.1"
    got = _one(spark, raw).select(pii_counts(F.col("t")).alias("m")).first().m
    assert got["EMAIL"] == 2 and got["IP"] == 1 and got["PHONE"] == 0


def test_word_ngram_counts_golden(spark):
    df = spark.createDataFrame(
        [("the cat sat",), ("the cat ran",), ("",)], ["text"]
    )
    rows = word_ngram_counts(df, "text", n=2, k=10).collect()
    got = {(r.ngram, r.n_occurrences) for r in rows}
    assert got == {("the cat", 2), ("cat sat", 1), ("cat ran", 1)}


def test_word_trigrams_deterministic_limit(spark):
    df = spark.createDataFrame([("a b c d",), ("a b c e",)], ["text"])
    rows = word_ngram_counts(df, "text", n=3, k=2).collect()
    # ("a b c", 2) first; tie between "b c d"/"b c e" broken by md5(ngram)
    # (collation-proof across engines): md5("b c e") = 4e88... sorts
    # before md5("b c d") = ea67...
    assert [(r.ngram, r.n_occurrences) for r in rows] == [("a b c", 2), ("b c e", 1)]


def test_repetition_stats_golden(spark):
    from batch_processing_pipeline_spark.functions.text_analysis import repetition_stats

    df = spark.createDataFrame(
        [(1, "spam spam spam spam"), (2, "all words here differ"), (3, "one")],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in repetition_stats(df).collect()}
    assert rows[1].n_words == 4
    assert rows[1].dup_word_ratio == 0.75  # 1 distinct / 4 total
    assert abs(rows[1].dup_bigram_ratio - (1 - 1 / 3)) < 1e-3  # "spam spam" ×3
    assert rows[2].dup_word_ratio == 0.0 and rows[2].dup_bigram_ratio == 0.0
    assert rows[3].n_words == 1 and rows[3].dup_bigram_ratio == 0.0
