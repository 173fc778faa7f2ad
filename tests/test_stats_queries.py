"""Property tests for the sequence/statistics query additions: gap-and-
islands streaks, two-sample KS, Mann-Whitney U, autocorrelation, and the
Zipf-law fit.  (Hash-vs-DuckDB equivalence is covered by
tools/check_oracle.py; these pin semantics the hash can't — agreement with
an independent driver-side reference computation on the same fixture.)"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from batch_processing_pipeline_spark.registry import QUERIES
from tests.conftest import SF_SMOKE


def _events_rows(spark):
    return spark.read.parquet(f"{SF_SMOKE}/events.parquet").collect()


def test_gap_islands_matches_python_reference(spark):
    rows = QUERIES["gap_islands"](spark, SF_SMOKE).collect()
    got = {r.user_id: (r.longest_streak, r.start_day, r.n_streaks) for r in rows}

    days = defaultdict(set)
    epoch = None
    import datetime

    epoch = datetime.date(2024, 1, 1)
    for r in _events_rows(spark):
        days[r.user_id].add((r.ts.date() - epoch).days)

    assert set(got) == set(days)
    for uid, dset in days.items():
        ordered = sorted(dset)
        streaks = []
        start = prev = ordered[0]
        for d in ordered[1:]:
            if d == prev + 1:
                prev = d
            else:
                streaks.append((prev - start + 1, start))
                start = prev = d
        streaks.append((prev - start + 1, start))
        best = max(streaks, key=lambda s: (s[0], -s[1]))
        assert got[uid] == (best[0], best[1], len(streaks)), uid


def _group_values(spark):
    a, b = [], []
    for r in _events_rows(spark):
        if r.event_type == "click":
            a.append(float(r.value))
        elif r.event_type == "purchase":
            b.append(float(r.value))
    return a, b


def test_ks_statistic_matches_python_reference(spark):
    row = QUERIES["ks_test"](spark, SF_SMOKE).first()
    a, b = _group_values(spark)
    assert (row.n_click, row.n_purchase) == (len(a), len(b))

    support = sorted(set(a) | set(b))
    ca = Counter(a)
    cb = Counter(b)
    fa = fb = 0.0
    d = 0.0
    for v in support:
        fa += ca[v] / len(a)
        fb += cb[v] / len(b)
        d = max(d, abs(fa - fb))
    assert abs(row.ks_d - d) < 1e-3


def test_mannwhitney_matches_python_reference(spark):
    row = QUERIES["mannwhitney_u"](spark, SF_SMOKE).first()
    a, b = _group_values(spark)
    pooled = sorted(a + b)
    # midranks
    rank_of = {}
    i = 0
    while i < len(pooled):
        j = i
        while j < len(pooled) and pooled[j] == pooled[i]:
            j += 1
        for _ in range(i, j):
            rank_of.setdefault(pooled[i], (i + j + 1) / 2.0)
        i = j
    sr_a = sum(rank_of[v] for v in a)
    na, nb = len(a), len(b)
    n = na + nb
    u = sr_a - na * (na + 1) / 2.0
    mu = na * nb / 2.0
    tie_counts = Counter(pooled)
    ties = sum(t**3 - t for t in tie_counts.values())
    sigma2 = na * nb / 12.0 * ((n + 1) - ties / (n * (n - 1)))
    z = (u - mu) / math.sqrt(sigma2)
    assert abs(row.u_stat - u) < 0.51  # round4 on a possibly .5 value
    assert abs(row.z_score - z) < 1e-3


def test_acf_lag_zero_normalization_and_bounds(spark):
    rows = QUERIES["acf_daily"](spark, SF_SMOKE).collect()
    assert sorted(r.lag for r in rows) == [1, 2, 3, 4, 5, 6, 7]
    # the biased estimator is bounded by |r_k| <= 1
    for r in rows:
        assert -1.0 <= r.acf <= 1.0, (r.lag, r.acf)

    # independent reference
    daily = Counter()
    import datetime

    epoch = datetime.date(2024, 1, 1)
    for e in _events_rows(spark):
        daily[(e.ts.date() - epoch).days] += 1
    xs = [float(daily[d]) for d in sorted(daily)]
    xbar = sum(xs) / len(xs)
    dev = [x - xbar for x in xs]
    denom = sum(d * d for d in dev)
    for r in rows:
        num = sum(dev[t] * dev[t + r.lag] for t in range(len(dev) - r.lag))
        assert abs(r.acf - num / denom) < 1e-3, r.lag


def test_zipf_fit_matches_python_ols(spark):
    row = QUERIES["zipf_fit"](spark, SF_SMOKE).first()
    freq = Counter()
    for d in spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect():
        for w in d.text.split(" "):
            if w:
                freq[w] += 1
    ranked = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))
    xs = [math.log(i + 1) for i in range(len(ranked))]
    ys = [math.log(n) for _, n in ranked]
    m = float(len(xs))
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    slope = (m * sxy - sx * sy) / (m * sxx - sx * sx)
    r2 = (m * sxy - sx * sy) ** 2 / ((m * sxx - sx * sx) * (m * syy - sy * sy))
    assert row.n_types == len(ranked)
    assert abs(row.slope - slope) < 1e-3
    assert abs(row.r2 - r2) < 1e-3
    # natural-ish text: slope is negative (frequency falls with rank)
    assert row.slope < 0


def test_stats_queries_have_no_python_udf_stage(spark):
    """All five run entirely JVM-side (no BatchEvalPython / ArrowEval)."""
    for name in ["gap_islands", "ks_test", "mannwhitney_u", "acf_daily", "zipf_fit"]:
        plan = QUERIES[name](spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name
