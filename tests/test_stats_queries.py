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


def _round4(x: float) -> float:
    return math.floor(x * 10000.0 + 0.5) / 10000.0


def test_kaplan_meier_matches_python_reference(spark):
    rows = QUERIES["kaplan_meier"](spark, SF_SMOKE).collect()
    got = {r.t_days: (r.n_risk, r.n_events, r.n_censored, r.km_survival) for r in rows}

    tau = 7
    first_day = {}
    first_purchase = {}
    for e in _events_rows(spark):
        d = e.ts.date()
        uid = e.user_id
        if uid not in first_day or d < first_day[uid]:
            first_day[uid] = d
        if e.event_type == "purchase" and (
            uid not in first_purchase or d < first_purchase[uid]
        ):
            first_purchase[uid] = d
    durs = []
    for uid, d0 in first_day.items():
        dp = first_purchase.get(uid)
        if dp is not None and (dp - d0).days <= tau:
            durs.append(((dp - d0).days, 1))
        else:
            durs.append((tau, 0))
    grp = defaultdict(lambda: [0, 0])
    for t, ev in durs:
        grp[t][0] += ev
        grp[t][1] += 1 - ev
    assert set(got) == set(grp)
    n_total = len(durs)
    s = 1.0
    consumed = 0
    for t in sorted(grp):
        d, c = grp[t]
        n_risk = n_total - consumed
        consumed += d + c
        factor = 1.0 - d / n_risk
        s = 0.0 if (s == 0.0 or factor <= 0.0) else s * factor
        nr, nd, nc, km = got[t]
        assert (nr, nd, nc) == (n_risk, d, c), t
        assert abs(km - s) < 1e-3, t


def test_basket_lift_matches_python_reference(spark):
    rows = QUERIES["basket_lift"](spark, SF_SMOKE).collect()
    li = {
        (r.l_orderkey, r.l_partkey)
        for r in spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").collect()
    }
    orders = defaultdict(set)
    item = Counter()
    for ok, pk in li:
        orders[ok].add(pk)
        item[pk] += 1
    n_orders = len(orders)
    pair_n = Counter()
    for parts in orders.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                pair_n[(ps[i], ps[j])] += 1
    scored = []
    for (pa, pb), n in pair_n.items():
        if n < 2:
            continue
        lift = _round4(n * n_orders / (item[pa] * item[pb]))
        scored.append(
            (pa, pb, n, _round4(n / n_orders), _round4(n / item[pa]), lift)
        )
    scored.sort(key=lambda r: (-r[5], r[0], r[1]))
    want = scored[:20]
    assert len(rows) == len(want)
    for r, w in zip(rows, want):
        assert (r.pa, r.pb, r.pair_n) == (w[0], w[1], w[2])
        assert abs(r.support - w[3]) < 1e-9
        assert abs(r.confidence - w[4]) < 1e-9
        assert abs(r.lift - w[5]) < 1e-9


def test_pareto_abc_matches_python_reference(spark):
    rows = QUERIES["pareto_abc"](spark, SF_SMOKE).collect()
    got = {r.abc_class: (r.n_parts, r.class_revenue, r.revenue_share) for r in rows}

    rev = defaultdict(float)
    for r in spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").collect():
        rev[r.l_partkey] += r.l_extendedprice * (1.0 - r.l_discount)
    ordered = sorted(rev.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(rev.values())
    cum = 0.0
    agg = defaultdict(lambda: [0, 0.0])
    for p, x in ordered:
        cum += x
        share = _round4(cum / total)
        cls = "A" if share <= 0.80 else ("B" if share <= 0.95 else "C")
        agg[cls][0] += 1
        agg[cls][1] += x
    assert set(got) == set(agg)
    for cls, (n, r_sum) in agg.items():
        gn, grev, gshare = got[cls]
        assert gn == n, cls
        assert abs(grev - _round4(r_sum)) < 1e-2, cls
        assert abs(gshare - r_sum / total) < 1e-3, cls


def test_mutual_info_matches_python_reference(spark):
    row = QUERIES["mutual_info"](spark, SF_SMOKE).first()
    import datetime

    epoch = datetime.date(2024, 1, 1)
    joint = Counter()
    for e in _events_rows(spark):
        joint[(e.event_type, (e.ts.date() - epoch).days % 7)] += 1
    n = sum(joint.values())
    nx = Counter()
    ny = Counter()
    for (x, y), c in joint.items():
        nx[x] += c
        ny[y] += c
    mi = sum(
        c / n * math.log((c / n) / ((nx[x] / n) * (ny[y] / n)))
        for (x, y), c in joint.items()
    )
    hx = sum(-(c / n) * math.log(nx[x] / n) for (x, _), c in joint.items())
    hy = sum(-(c / n) * math.log(ny[y] / n) for (_, y), c in joint.items())
    assert abs(row.mi_nats - mi) < 1e-3
    assert abs(row.h_event_type - hx) < 1e-3
    assert abs(row.h_dow - hy) < 1e-3
    assert abs(row.nmi - mi / math.sqrt(hx * hy)) < 1e-3
    # information-theory invariants: 0 <= MI <= min(H(X), H(Y))
    assert -1e-9 <= row.mi_nats <= min(row.h_event_type, row.h_dow) + 1e-9


def test_theil_sen_matches_python_reference(spark):
    row = QUERIES["theil_sen"](spark, SF_SMOKE).first()
    import datetime
    import statistics

    epoch = datetime.date(2024, 1, 1)
    daily = Counter()
    for e in _events_rows(spark):
        daily[(e.ts.date() - epoch).days] += 1
    days = sorted(daily)
    xs = {d: float(daily[d]) for d in days}
    slopes = [
        (xs[b] - xs[a]) / (b - a)
        for i, a in enumerate(days)
        for b in days[i + 1 :]
    ]
    m = statistics.median(slopes)  # == interpolated 0.5 quantile
    intercept = statistics.median(xs[d] - m * d for d in days)
    assert row.n_days == len(days)
    assert row.n_pairs == len(slopes)
    assert abs(row.slope - m) < 1e-3
    assert abs(row.intercept - intercept) < 1e-3


def test_second_stats_batch_has_no_python_udf_stage(spark):
    for name in [
        "kaplan_meier",
        "basket_lift",
        "pareto_abc",
        "mutual_info",
        "theil_sen",
    ]:
        plan = QUERIES[name](spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name


def test_ndcg_eval_matches_python_reference(spark, sf_dir):
    """Recompute one prefix's NDCG@10 in pure python (hashlib md5 grades,
    explicit DCG/IDCG) and pin the engine row to it."""
    import hashlib
    import math

    from batch_processing_pipeline_spark.registry import QUERIES

    rows = QUERIES["ndcg_eval"](spark, sf_dir).collect()
    assert len(rows) == 20
    assert all(0.0 <= r.ndcg10 <= 1.0 for r in rows)

    # rebuild the suggestion list for the busiest prefix from raw data
    from pyspark.sql import functions as F

    target = rows[0].prefix
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    q = (
        d.where(F.col("text").isNotNull())
        .select(F.substring(F.lower(F.trim("text")), 1, 500).alias("query"))
        .where(F.length("query") >= 2)
    )
    cand = (
        q.where(F.col("query").startswith(target))
        .where(F.length("query") >= len(target))
        .groupBy("query")
        .count()
        .collect()
    )
    ranked = sorted(cand, key=lambda r: (-r["count"], r.query))[:10]

    def rel(prefix, query):
        h = hashlib.md5(f"rel:{prefix}:{query}".encode()).hexdigest()[:8]
        return int(h, 16) % 4

    grades = [rel(target, r.query) for r in ranked]
    dcg = sum((2 ** g - 1) / math.log2(i + 2) for i, g in enumerate(grades))
    idcg = sum(
        (2 ** g - 1) / math.log2(i + 2)
        for i, g in enumerate(sorted(grades, reverse=True))
    )
    expect = dcg / idcg if idcg > 0 else 0.0
    expect_r4 = math.floor(expect * 10000 + 0.5) / 10000
    assert abs(rows[0].ndcg10 - expect_r4) < 1e-9


def test_bayes_smooth_rank_shrinkage(spark, sf_dir):
    """Smoothing property: every smoothed mean lies strictly between the
    part's raw mean and the global mean (or equals them when they
    coincide), and low-n parts shrink harder."""
    from pyspark.sql import functions as F

    from batch_processing_pipeline_spark.registry import QUERIES

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    m = li.agg((F.sum("l_quantity") / F.count(F.lit(1))).alias("m")).collect()[0].m
    rows = QUERIES["bayes_smooth_rank"](spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        lo, hi = sorted((r.raw_mean, m))
        assert lo - 1e-4 <= r.smoothed_mean <= hi + 1e-4, r
        # shrinkage factor matches the closed form
        import math
        expect = (25.0 * m + r.raw_mean * r.n_lineitems) / (25.0 + r.n_lineitems)
        assert abs(r.smoothed_mean - math.floor(expect * 10000 + 0.5) / 10000) < 2e-4
