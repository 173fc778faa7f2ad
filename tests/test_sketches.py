"""Approximate aggregates: HLL++ / quantile-sketch error bounds vs exact.

The approx_* twins are the 100 TB formulation of the exact-percentile
queries (bounded-memory mergeable sketches instead of per-group value
buffers); these tests pin each twin to its exact counterpart so the swap
can never silently drift.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from batch_processing_pipeline_spark.registry import QUERIES


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    approx = {
        r.o_orderstatus: r.n_cust_approx
        for r in QUERIES["approx_distinct"](spark, sf_dir).collect()
    }
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    exact = {
        r.o_orderstatus: r.n
        for r in o.groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    for k, n in exact.items():
        assert abs(approx[k] - n) / n < 0.05  # rsd=0.02 → 5% is generous

def test_approx_percentiles_close_to_exact(spark, sf_dir):
    exact = {r.l_returnflag: r for r in QUERIES["percentiles"](spark, sf_dir).collect()}
    approx = {
        r.l_returnflag: r
        for r in QUERIES["approx_percentiles"](spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    # accuracy=10000 → rank error ≤ 1e-4; quantity spans ~1..50, so even a
    # conservative value-space tolerance is tiny
    for k, e in exact.items():
        a = approx[k]
        for c in ("p25", "p50", "p90"):
            assert abs(getattr(a, c) - getattr(e, c)) <= 0.5, (k, c)


def test_approx_equidepth_buckets_near_uniform(spark, sf_dir):
    rows = QUERIES["approx_equidepth_buckets"](spark, sf_dir).collect()
    assert sorted(r.bucket for r in rows) == list(range(1, 11))
    total = sum(r.n for r in rows)
    for r in rows:
        # equi-depth: every decile holds ~10% (quantity is discrete-ish,
        # so allow the same slack the exact query's distribution shows)
        assert 0.03 < r.n / total < 0.25, (r.bucket, r.n / total)


def test_approx_rfm_scores_match_exact_almost_everywhere(spark, sf_dir):
    exact = QUERIES["rfm_scores"](spark, sf_dir)
    approx = QUERIES["approx_rfm_scores"](spark, sf_dir)
    assert exact.schema == approx.schema
    n = exact.count()
    assert approx.count() == n
    # sketched tercile boundaries may reassign only customers sitting ON a
    # boundary; everyone else scores identically
    diff = exact.alias("e").join(approx.alias("a"), "o_custkey").where(
        (F.col("e.r_score") != F.col("a.r_score"))
        | (F.col("e.f_score") != F.col("a.f_score"))
        | (F.col("e.m_score") != F.col("a.m_score"))
    ).count()
    assert diff / n < 0.02, f"{diff}/{n} customers scored differently"


def test_approx_mad_outliers_agree_with_exact(spark, sf_dir):
    exact = {
        (r.event_id, r.event_type)
        for r in QUERIES["mad_outliers"](spark, sf_dir).collect()
    }
    approx = {
        (r.event_id, r.event_type)
        for r in QUERIES["approx_mad_outliers"](spark, sf_dir).collect()
    }
    # flag sets may differ only at the score≈3.0 boundary
    sym = len(exact ^ approx)
    assert sym <= max(2, int(0.02 * max(len(exact), 1))), (
        len(exact), len(approx), sym,
    )


def test_hll_union_of_batch_sketches_equals_whole_corpus(spark, sf_dir):
    """Merging per-batch HLL sketches must equal sketching the whole
    corpus (the incremental count-distinct state property), and the
    estimate must sit within HLL's error bound of exact."""
    from batch_processing_pipeline_spark.registry import QUERIES, _events

    rows = {r.event_type: r for r in QUERIES["hll_union"](spark, sf_dir).collect()}
    e = _events(spark, sf_dir)
    whole = {
        r.event_type: r.est
        for r in e.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"))
        .collect()
    }
    for etype, r in rows.items():
        assert r.est_users == whole[etype], "merge must equal whole-corpus sketch"
        assert abs(r.est_users - r.exact_users) / r.exact_users < 0.05
