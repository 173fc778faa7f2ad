"""ML quality classifier: separability, determinism, scoring shape."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from batch_processing_pipeline_spark.functions.quality_model import (
    score_quality,
    text_features,
    train_quality_lr,
)


def _labeled(spark, sf_dir):
    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return d.withColumn("is_en", (F.col("lang") == "en").cast("double"))


def test_features_are_pure_projections(spark, sf_dir):
    d = _labeled(spark, sf_dir)
    plan = (
        text_features(d)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_classifier_separates_clean_from_corrupted(spark, sf_dir):
    """The production task this stage exists for: clean prose vs noisy/
    boilerplate text. Corrupt half the corpus with punctuation junk and
    stopword stripping; the classifier must recover the labels far above
    chance on a held-out split. (The fixture's ``lang`` column is NOT
    learnable — all languages share one synthetic vocabulary — so the
    test constructs its own ground truth.)"""
    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    clean = d.select("doc_id", "text").withColumn("label", F.lit(0.0))
    corrupted = d.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(
            F.regexp_replace("text", r"\b(the|a|of|and|in|to)\b", ""),
            F.lit(" !!! ### $$$ %%% &&& *** !!!"),
        ).alias("text"),
    ).withColumn("label", F.lit(1.0))
    both = clean.unionByName(corrupted)
    train = both.where(F.col("doc_id") % 5 != 0)
    held = both.where(F.col("doc_id") % 5 == 0)
    model = train_quality_lr(train, "label")
    scored = score_quality(model, held, keep_cols=("doc_id", "label"))
    acc = scored.select(
        F.avg(
            ((F.col("quality_prob") > 0.5).cast("double") == F.col("label"))
            .cast("double")
        ).alias("acc")
    ).first().acc
    assert acc > 0.9, acc


def test_refit_is_deterministic(spark, sf_dir):
    d = _labeled(spark, sf_dir)
    m1 = train_quality_lr(d, "is_en")
    m2 = train_quality_lr(d, "is_en")
    c1 = list(m1.stages[-1].coefficients)
    c2 = list(m2.stages[-1].coefficients)
    assert c1 == c2
    assert m1.stages[-1].intercept == m2.stages[-1].intercept


def test_scoring_is_total_and_bounded(spark, sf_dir):
    d = _labeled(spark, sf_dir)
    model = train_quality_lr(d, "is_en")
    scored = score_quality(model, d, keep_cols=("doc_id",))
    assert scored.count() == d.count()
    mm = scored.agg(F.min("quality_prob"), F.max("quality_prob")).first()
    assert 0.0 <= mm[0] <= mm[1] <= 1.0
