"""ML-trained quality/label classifier over heuristic text features.

The heuristic signals (``text_analysis``: stopword ratio, punctuation
ratio, token stats) are each weak alone; production curation pipelines
train a light classifier on them (the FastText/logreg stage of the
C4/CCNet-style pipeline). This module is that stage on Spark ML:
deterministic column features → ``VectorAssembler`` → seeded
``LogisticRegression``.

Scale shape: feature extraction is pure column expressions (codegen,
zero shuffle); LR training is Spark ML's distributed L-BFGS (one small
coefficient vector on the driver); scoring broadcasts the model and is
again map-side. Training data at 100 TB would be a deterministic sample
(``operators/sampling.deterministic_sample``), never the full corpus.

Declared rows-only for the oracle harness: coefficient values are
engine-specific (L-BFGS float paths), so tests pin behavior instead —
seeded determinism across refits and a separability floor on held-out
accuracy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from batch_processing_pipeline_spark.functions.text_analysis import (
    mean_word_length,
    punct_ratio,
    stopword_ratio,
    whitespace_token_count,
)

FEATURE_COLS = ("f_stop_en", "f_stop_de", "f_punct", "f_mwl", "f_ntok")


def text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the heuristic feature columns (pure projections)."""
    t = F.col(text_col)
    return df.select(
        "*",
        stopword_ratio(t, "en").alias("f_stop_en"),
        stopword_ratio(t, "de").alias("f_stop_de"),
        punct_ratio(t).alias("f_punct"),
        F.coalesce(mean_word_length(t), F.lit(0.0)).alias("f_mwl"),
        whitespace_token_count(t).cast("double").alias("f_ntok"),
    )


def train_quality_lr(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    max_iter: int = 30,
    reg_param: float = 0.01,
):
    """Fit a seeded logistic regression on the heuristic features.

    Returns the fitted PipelineModel (assembler + LR). Deterministic for
    a fixed input: L-BFGS from a zero start on a fixed feature matrix has
    no random state (the ``seed`` covers subsampling paths).
    """
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    feats = text_features(df, text_col)
    assembler = VectorAssembler(
        inputCols=list(FEATURE_COLS), outputCol="features"
    )
    lr = LogisticRegression(
        featuresCol="features",
        labelCol=label_col,
        maxIter=max_iter,
        regParam=reg_param,
    )
    return Pipeline(stages=[assembler, lr]).fit(feats)


def score_quality(
    model, df: DataFrame, text_col: str = "text", keep_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Attach p(label=1) as ``quality_prob`` (model broadcast, map-side)."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(text_features(df, text_col))
    return scored.select(
        *keep_cols,
        vector_to_array("probability")[1].alias("quality_prob"),
    )
