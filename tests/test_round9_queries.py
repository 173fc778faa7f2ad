"""Round-9 registry additions: weighted_sample (A-RES), exact_quantiles
(nearest-rank via exact_global_rank), ivfpq_index_drift accounting."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from batch_processing_pipeline_spark.registry import QUERIES


def test_weighted_sample_is_deterministic_and_biased_to_weight(spark, sf_dir):
    rows1 = QUERIES["weighted_sample"](spark, sf_dir).collect()
    rows2 = QUERIES["weighted_sample"](spark, sf_dir).collect()
    assert sorted(map(tuple, rows1)) == sorted(map(tuple, rows2))
    assert len(rows1) == 50
    assert sorted(r.rank for r in rows1) == list(range(1, 51))
    # A-RES with weight = n_chars must oversample long documents: the
    # sample's mean weight exceeds the corpus mean (isotropic fixture,
    # 50-of-500 — the gap is far larger than sampling noise)
    corpus_mean = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .agg(F.avg("n_chars"))
        .collect()[0][0]
    )
    sample_mean = sum(r.weight for r in rows1) / len(rows1)
    assert sample_mean > corpus_mean, (sample_mean, corpus_mean)


def test_exact_quantiles_matches_numpy_nearest_rank(spark, sf_dir):
    got = {r.q: r.value for r in QUERIES["exact_quantiles"](spark, sf_dir).collect()}
    v = np.sort(
        np.array(
            spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .select(F.col("l_quantity").cast("double"))
            .toPandas()["l_quantity"]
        )
    )
    n = len(v)
    for q in (0.25, 0.5, 0.9, 0.99):
        expected = float(v[int(np.ceil(q * n)) - 1])  # type-1 nearest rank
        assert abs(got[q] - expected) < 1e-9, (q, got[q], expected)


def test_ivfpq_index_drift_accounting(spark, sf_dir):
    rows = QUERIES["ivfpq_index_drift"](spark, sf_dir).collect()
    assert rows, "no cells audited"
    # every cell with appended vectors has a positive residual norm and,
    # same-distribution fixture halves, a drift ratio near 1
    n_total = 0
    for r in rows:
        n_total += r.n_new
        if r.n_new > 0:
            assert r.mean_res_norm_new > 0
        if r.drift is not None and r.n_new > 0:
            assert 0.5 < r.drift < 2.0, r
    emb_n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    # the refresh batch is vec_id % 3 == 0
    assert n_total == sum(
        1
        for (i,) in spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id")
        .collect()
        if i % 3 == 0
    )
    assert 0 < n_total < emb_n
