"""Registry section: near-dup fingerprints, URL/session analytics, causal inference, concentration and drift statistics.

Split from the former single-file registry (round 7); registers its
queries into the shared ``QUERIES``/``ORACLES`` dicts at import time.
"""

from __future__ import annotations

from batch_processing_pipeline_spark.functions.rounding import (
    cents,
    sql_cents,
    sql_sum_money,
    sum_money,
)
from batch_processing_pipeline_spark.registry._base import (  # noqa: F401
    F,
    ORACLES,
    QUERIES,
    R,
    Window,
    _events,
    _t,
    language_id,
    normalize_queries,
    prefix_frequencies,
    round4,
    top_k_per_group,
)
from batch_processing_pipeline_spark.registry.core import _LANGID_ORACLE  # noqa: F401

def q_winnowing_dup_pairs(spark, sf):
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken
    2003, "Winnowing: Local Algorithms for Document Fingerprinting" —
    the MOSS algorithm): per k-gram hash sequence, select the RIGHTMOST
    MINIMUM of every w-length window; the guarantee MinHash lacks is
    POSITIONAL — every match of length >= w+k-1 shares at least one
    selected fingerprint, so near-dup detection has a provable no-miss
    window.

    Engine shape: the rightmost-min-per-window argmin is encoded into
    one BIGINT key (hash * 4096 + (4096 - pos): min picks the smallest
    hash, ties the largest pos) so window selection is a plain MIN over
    a per-doc ordered frame — portable to the oracle verbatim, no
    argmin/struct-window support needed. Fingerprints dedup per doc,
    stopgram-class fingerprints (df > 10% of docs) drop exactly as the
    inverted-index path drops them (the skew hazard at corpus scale),
    and candidate pairs come from the fingerprint-bucket self-join —
    never an all-pairs scan. Pairs sharing >= 3 fingerprints emit.

    Round-12 shape fix (guide §3.3, "materialise an intermediate to
    truncate the plan"): ``fps`` feeds THREE consumers (the stopgram df
    aggregation and both self-join sides) and ``kept`` two — before, the
    physical plan recomputed the whole 5M-gram md5 explode + per-doc
    window-min + distinct pipeline FOUR times (once per branch; exchange
    reuse only dedupes the pre-window shuffle, never the window sort or
    the distinct above it). ``fps`` is now eagerly
    localCheckpoint-materialized once, so the gram pipeline runs exactly
    once; the stopgram count is a plain ``count(*)`` because ``fps`` is
    distinct on (doc_id, fh) by construction — ``countDistinct`` planned
    an extra two-phase expand over the same rows for the same number.
    Output is bit-identical (same relation contents; oracle re-verified
    at three scales)."""
    k, w, cap = 5, 8, 0.10
    d = _t(spark, sf, "documents").select(
        "doc_id",
        F.substring(F.lower(F.trim(F.col("text"))), 1, 1000).alias("t"),
    ).where(F.length("t") >= k + w - 1)
    n_docs = d.count()
    grams = d.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(1), F.length("t") - F.lit(k - 1))
        ).alias("p"),
        "t",
    ).select(
        "doc_id",
        "p",
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.expr(f"substring(t, p, {k})")), 1, 10
                ),
                16,
                10,
            ).cast("bigint"),
            F.lit(1 << 40),
        ).alias("hs"),
    )
    win = Window.partitionBy("doc_id").orderBy("p").rowsBetween(-(w - 1), 0)
    key = F.col("hs") * 4096 + (F.lit(4096) - F.col("p"))
    sel = grams.select(
        "doc_id",
        "p",
        F.min(key).over(win).alias("sel_key"),
    ).where(F.col("p") >= w)
    # materialized ONCE (three consumers; see docstring). Measured
    # variant selection (same-session interleaved, sf0.1): checkpointing
    # fps alone beats both the old 4-branch recompute (~5% locally; the
    # redundant branches ran in parallel on idle cores, so the local gap
    # understates the serial work removed) and a heavier
    # repartition+checkpoint-both-relations variant (+10%: two extra
    # exchanges and a third serialized materialization). The distinct's
    # own AQE-coalesced partitioning is kept as the checkpoint layout —
    # data-sized at corpus scale via the advisory size.
    fps = (
        sel.select("doc_id", (F.col("sel_key") / 4096).cast("bigint").alias("fh"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # fps is distinct on (doc_id, fh): count(*) per fh == countDistinct
    hot = fps.groupBy("fh").agg(F.count(F.lit(1)).alias("df")).where(
        F.col("df") > n_docs * cap
    )
    kept = fps.join(hot.select("fh"), "fh", "left_anti")
    a, b = kept.alias("a"), kept.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fh") == F.col("b.fh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .where(F.col("n_shared") >= 3)
    )


ORACLES["winnowing_dup_pairs"] = """
    WITH d AS (
      SELECT doc_id, substr(lower(trim(text)), 1, 1000) AS t
      FROM documents WHERE length(substr(lower(trim(text)), 1, 1000)) >= 12
    ), nd AS (SELECT COUNT(*) AS n FROM d),
    grams AS (
      SELECT doc_id, CAST(p AS BIGINT) AS p,
             CAST('0x' || substr(md5(substr(t, CAST(p AS INTEGER), 5)), 1, 10)
                  AS BIGINT) % (CAST(1 AS BIGINT) << 40) AS hs
      FROM d, UNNEST(range(1, length(t) - 3)) AS u(p)
    ), sel AS (
      SELECT doc_id, p,
             MIN(hs * 4096 + (4096 - p)) OVER (PARTITION BY doc_id ORDER BY p
               ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS sel_key
      FROM grams
    ), fps AS (
      SELECT DISTINCT doc_id, sel_key // 4096 AS fh
      FROM sel WHERE p >= 8
    ), hot AS (
      SELECT fh FROM fps, nd GROUP BY fh, nd.n
      HAVING COUNT(DISTINCT doc_id) > nd.n * 0.10
    ), kept AS (
      SELECT * FROM fps WHERE fh NOT IN (SELECT fh FROM hot)
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM kept a JOIN kept b ON a.fh = b.fh AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING COUNT(*) >= 3
"""
QUERIES["winnowing_dup_pairs"] = q_winnowing_dup_pairs


def q_url_normalize(spark, sf):
    """URL parsing + canonicalization — the first step of every web-crawl
    curation pipeline (per-host quotas, tracking-param stripping, dedup
    on canonical URLs). URLs are synthesized deterministically from the
    fixture; the ENGINE side exercises the real ``parse_url`` builtin
    (HOST / PATH / QUERY parts) and strips ``utm_*`` tracking params by
    rebuilding the kept query string; the oracle mirrors with regexes.
    Output: per-host rollup with distinct canonical URLs — the quota
    relation a politeness-aware crawler consumes."""
    d = _t(spark, sf, "documents")
    url = F.concat(
        F.lit("https://site"),
        (F.col("doc_id") % 20).cast("string"),
        F.lit(".example.com/"),
        F.col("source"),
        F.lit("/p"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit("?id="),
        F.col("doc_id").cast("string"),
        F.lit("&utm_source=feed&utm_campaign=c"),
        (F.col("doc_id") % 3).cast("string"),
        F.lit("&ref=r"),
        (F.col("doc_id") % 5).cast("string"),
    )
    u = d.select("doc_id", url.alias("url"))
    parsed = u.select(
        "doc_id",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("q"),
    )
    kept_params = F.filter(
        F.split("q", "&", -1), lambda kv: ~kv.startswith("utm_")
    )
    canon = parsed.select(
        "doc_id",
        "host",
        F.concat(
            F.col("host"), F.col("path"),
            F.lit("?"), F.array_join(kept_params, "&"),
        ).alias("canonical"),
    )
    return canon.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.countDistinct("canonical").alias("n_canonical"),
    )


ORACLES["url_normalize"] = """
    WITH u AS (
      SELECT doc_id,
             'https://site' || CAST(doc_id % 20 AS VARCHAR)
               || '.example.com/' || source || '/p'
               || CAST(doc_id % 7 AS VARCHAR)
               || '?id=' || CAST(doc_id AS VARCHAR)
               || '&utm_source=feed&utm_campaign=c'
               || CAST(doc_id % 3 AS VARCHAR)
               || '&ref=r' || CAST(doc_id % 5 AS VARCHAR) AS url
      FROM documents
    ), parsed AS (
      SELECT doc_id,
             regexp_extract(url, 'https://([^/]+)', 1) AS host,
             regexp_extract(url, 'https://[^/]+(/[^?]*)', 1) AS path,
             regexp_extract(url, '\\?(.*)$', 1) AS q
      FROM u
    ), canon AS (
      SELECT doc_id, host,
             host || path || '?' ||
             array_to_string(
               list_filter(string_split(q, '&'),
                           kv -> NOT starts_with(kv, 'utm_')), '&')
               AS canonical
      FROM parsed
    )
    SELECT host, CAST(COUNT(*) AS BIGINT) AS n_urls,
           CAST(COUNT(DISTINCT canonical) AS BIGINT) AS n_canonical
    FROM canon GROUP BY host
"""
QUERIES["url_normalize"] = q_url_normalize


def q_neyman_alloc(spark, sf):
    """Neyman optimal allocation for stratified sampling: per-stratum
    sample sizes n_h proportional to N_h * sigma_h (minimum-variance
    allocation for a fixed total budget n) — the survey-statistics
    answer to "which strata deserve the sample". Strata are event
    types, the measured variable is `value`, budget n = 500. One
    fact-table moment pass, then window math over the stratum relation;
    the realized sample would use the hash-threshold filter at rate
    n_h / N_h (sampling.py), so the allocation composes with the
    deterministic-sampling discipline."""
    budget = 500.0
    e = _events(spark, sf).where(F.col("value").isNotNull())
    per = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("nh"),
        F.stddev_pop("value").alias("sh"),
    )
    w = Window.partitionBy()
    t = per.select(
        "event_type",
        "nh",
        "sh",
        (F.col("nh") * F.col("sh")).alias("wt"),
        F.sum(F.col("nh") * F.col("sh")).over(w).alias("tot_wt"),
    )
    alloc = F.lit(budget) * F.col("wt") / F.col("tot_wt")
    return t.select(
        "event_type",
        F.col("nh").cast("long").alias("n_stratum"),
        round4(F.col("sh")).alias("sigma"),
        round4(alloc).alias("n_alloc"),
        round4(alloc / F.col("nh")).alias("rate"),
    )


ORACLES["neyman_alloc"] = f"""
    WITH per AS (
      SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS nh,
             stddev_pop(value) AS sh
      FROM events WHERE value IS NOT NULL GROUP BY event_type
    ), t AS (
      SELECT event_type, nh, sh, nh * sh AS wt,
             SUM(nh * sh) OVER () AS tot_wt
      FROM per
    )
    SELECT event_type, CAST(nh AS BIGINT) AS n_stratum,
           {R("sh")} AS sigma,
           {R("500.0 * wt / tot_wt")} AS n_alloc,
           {R("500.0 * wt / tot_wt / nh")} AS rate
    FROM t
"""
QUERIES["neyman_alloc"] = q_neyman_alloc


def q_dq_expectations(spark, sf):
    """Data-contract expectation suite (the Great-Expectations pattern):
    a fixed panel of typed expectations — null rate, key uniqueness,
    value range, set membership, referential integrity, freshness — each
    evaluated to (violations, checked, passed) in ONE pass per table.
    This is the governance artifact a 100-TB ingest gates on: every
    expectation folds into conditional aggregates (map-side combine),
    and the only join is the referential anti-probe.

    Output: one row per expectation with its violation count and a
    boolean verdict — the shape a CI gate or a freshness monitor
    consumes."""
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    c = _t(spark, sf, "customer")

    o_checks = o.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)).alias(
            "null_key"
        ),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("dup_key"),
        F.sum(F.when(F.col("o_totalprice") <= 0.0, 1).otherwise(0)).alias(
            "bad_price"
        ),
        F.sum(
            F.when(
                ~F.col("o_orderstatus").isin("O", "F", "P"), 1
            ).otherwise(0)
        ).alias("bad_status"),
        F.sum(
            F.when(
                (F.to_date("o_orderdate") < F.lit("1992-01-01"))
                | (F.to_date("o_orderdate") > F.lit("2003-12-31")),
                1,
            ).otherwise(0)
        ).alias("stale_date"),
    )
    orphan = (
        o.join(
            c.select(F.col("c_custkey").alias("o_custkey")),
            "o_custkey",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("orphans"))
    )
    li_neg = li.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(
            F.when(
                (F.col("l_discount") < 0.0) | (F.col("l_discount") > 1.0), 1
            ).otherwise(0)
        ).alias("bad_disc"),
    )

    def row(name, checked, violations):
        return F.struct(
            F.lit(name).alias("expectation"),
            checked.cast("long").alias("n_checked"),
            violations.cast("long").alias("n_violations"),
            (violations == 0).alias("passed"),
        )

    packed = (
        o_checks.crossJoin(F.broadcast(orphan))
        .crossJoin(F.broadcast(li_neg.select(F.col("_n").alias("_nl"), "bad_disc")))
        .select(
            F.explode(
                F.array(
                    row("orders.o_orderkey not_null", F.col("_n"), F.col("null_key")),
                    row("orders.o_orderkey unique", F.col("_n"), F.col("dup_key")),
                    row("orders.o_totalprice positive", F.col("_n"), F.col("bad_price")),
                    row("orders.o_orderstatus in_set", F.col("_n"), F.col("bad_status")),
                    row("orders.o_orderdate fresh_range", F.col("_n"), F.col("stale_date")),
                    row("orders.o_custkey references customer", F.col("_n"), F.col("orphans")),
                    row("lineitem.l_discount in [0,1]", F.col("_nl"), F.col("bad_disc")),
                )
            ).alias("r")
        )
        .select("r.expectation", "r.n_checked", "r.n_violations", "r.passed")
    )
    return packed


ORACLES["dq_expectations"] = """
    WITH o AS (SELECT COUNT(*) AS n FROM orders),
    l AS (SELECT COUNT(*) AS n FROM lineitem)
    SELECT 'orders.o_orderkey not_null' AS expectation,
           CAST(o.n AS BIGINT) AS n_checked,
           CAST((SELECT COUNT(*) FROM orders WHERE o_orderkey IS NULL)
                AS BIGINT) AS n_violations,
           (SELECT COUNT(*) FROM orders WHERE o_orderkey IS NULL) = 0 AS passed
    FROM o
    UNION ALL
    SELECT 'orders.o_orderkey unique', o.n,
           (SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders),
           (SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders) = 0
    FROM o
    UNION ALL
    SELECT 'orders.o_totalprice positive', o.n,
           (SELECT COUNT(*) FROM orders WHERE o_totalprice <= 0.0),
           (SELECT COUNT(*) FROM orders WHERE o_totalprice <= 0.0) = 0
    FROM o
    UNION ALL
    SELECT 'orders.o_orderstatus in_set', o.n,
           (SELECT COUNT(*) FROM orders
            WHERE o_orderstatus NOT IN ('O', 'F', 'P')),
           (SELECT COUNT(*) FROM orders
            WHERE o_orderstatus NOT IN ('O', 'F', 'P')) = 0
    FROM o
    UNION ALL
    SELECT 'orders.o_orderdate fresh_range', o.n,
           (SELECT COUNT(*) FROM orders
            WHERE CAST(o_orderdate AS DATE) < DATE '1992-01-01'
               OR CAST(o_orderdate AS DATE) > DATE '2003-12-31'),
           (SELECT COUNT(*) FROM orders
            WHERE CAST(o_orderdate AS DATE) < DATE '1992-01-01'
               OR CAST(o_orderdate AS DATE) > DATE '2003-12-31') = 0
    FROM o
    UNION ALL
    SELECT 'orders.o_custkey references customer', o.n,
           (SELECT COUNT(*) FROM orders
            WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)),
           (SELECT COUNT(*) FROM orders
            WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)) = 0
    FROM o
    UNION ALL
    SELECT 'lineitem.l_discount in [0,1]', l.n,
           (SELECT COUNT(*) FROM lineitem
            WHERE l_discount < 0.0 OR l_discount > 1.0),
           (SELECT COUNT(*) FROM lineitem
            WHERE l_discount < 0.0 OR l_discount > 1.0) = 0
    FROM l
"""
QUERIES["dq_expectations"] = q_dq_expectations


def q_moments_merge(spark, sf):
    """Mergeable-moments aggregation made EXPLICIT: per-day partial
    states (n, mean, M2) pairwise-merge to the global variance via the
    Chan/Golub/LeVeque parallel-update formula — the algebra every
    distributed variance already uses internally, surfaced as a query so
    the merge path itself is differentially pinned (an incremental
    statistics store persists exactly these partials and merges on
    read; getting M2's cross-term wrong matches on small data and
    silently diverges at scale).

    The merge runs as one ordered F.aggregate fold over the day-state
    array (series-length bounded); the oracle folds the same states in
    a recursive CTE in the same order, and the direct single-pass
    variance rides along so merged == direct is part of the hash."""
    e = _events(spark, sf)
    per_day = e.groupBy(F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("value").alias("mean"),
        (F.var_pop("value") * F.count(F.lit(1))).alias("m2"),
    )
    states = per_day.agg(
        F.array_sort(F.collect_list(F.struct("d", "n", "mean", "m2"))).alias(
            "s"
        )
    )

    def merge(acc, st):
        na, nb = acc["n"], st["n"]
        n = na + nb
        delta = st["mean"] - acc["mean"]
        return F.struct(
            n.alias("n"),
            (acc["mean"] + delta * nb / n).alias("mean"),
            (acc["m2"] + st["m2"] + delta * delta * na * nb / n).alias("m2"),
        )

    folded = states.select(
        F.aggregate(
            F.slice("s", 2, F.size("s") - 1),
            F.struct(
                F.col("s")[0]["n"].alias("n"),
                F.col("s")[0]["mean"].alias("mean"),
                F.col("s")[0]["m2"].alias("m2"),
            ),
            merge,
        ).alias("g"),
        F.size("s").cast("long").alias("n_partials"),
    )
    direct = e.agg(
        F.avg("value").alias("dmean"), F.var_pop("value").alias("dvar")
    )
    return folded.crossJoin(F.broadcast(direct)).select(
        "n_partials",
        F.col("g")["n"].cast("long").alias("n_rows"),
        round4(F.col("g")["mean"]).alias("merged_mean"),
        round4(F.col("g")["m2"] / F.col("g")["n"]).alias("merged_var"),
        round4(F.col("dmean")).alias("direct_mean"),
        round4(F.col("dvar")).alias("direct_var"),
    )


ORACLES["moments_merge"] = f"""
    WITH RECURSIVE per_day AS (
      SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS DOUBLE) AS n,
             AVG(value) AS mean, var_pop(value) * COUNT(*) AS m2
      FROM events GROUP BY 1
    ), idx AS (
      SELECT n, mean, m2, ROW_NUMBER() OVER (ORDER BY d) AS i FROM per_day
    ), fold(i, n, mean, m2) AS (
      SELECT CAST(1 AS BIGINT), n, mean, m2 FROM idx WHERE i = 1
      UNION ALL
      SELECT idx.i,
             f.n + idx.n,
             f.mean + (idx.mean - f.mean) * idx.n / (f.n + idx.n),
             f.m2 + idx.m2 + (idx.mean - f.mean) * (idx.mean - f.mean)
               * f.n * idx.n / (f.n + idx.n)
      FROM fold f JOIN idx ON idx.i = f.i + 1
    ), last AS (SELECT MAX(i) AS k FROM idx),
    direct AS (
      SELECT AVG(value) AS dmean, var_pop(value) AS dvar FROM events
    )
    SELECT CAST(last.k AS BIGINT) AS n_partials,
           CAST(f.n AS BIGINT) AS n_rows,
           {R("f.mean")} AS merged_mean,
           {R("f.m2 / f.n")} AS merged_var,
           {R("direct.dmean")} AS direct_mean,
           {R("direct.dvar")} AS direct_var
    FROM fold f, last, direct WHERE f.i = last.k
"""
QUERIES["moments_merge"] = q_moments_merge


def q_full_outer_recon(spark, sf):
    """FULL OUTER reconciliation — the ledger-vs-ledger audit shape (two
    systems' daily rollups joined so rows missing on EITHER side surface
    with a typed status). Sides: EXTREME-value purchases per day vs
    extreme-value clicks per day (the rare-transaction audit — both
    sides are sparse, so days genuinely missing one side exist at every
    scale factor and all three status arms fire). Completes the
    join-type matrix (inner/left/semi/anti/theta/cross elsewhere; this
    is the outer-both case with its NULL-handling contract pinned)."""
    e = _events(spark, sf)
    purchases = (
        e.where((F.col("event_type") == "purchase") & (F.col("value") > 200.0))
        .groupBy(F.to_date("ts").alias("d"))
        .agg(
            F.count(F.lit(1)).alias("n_purch"),
            round4(sum_money(F.col("value"))).alias("rev"),
        )
    )
    clicks = (
        e.where((F.col("event_type") == "click") & (F.col("value") > 200.0))
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("n_click"))
    )
    j = purchases.join(clicks, "d", "full_outer")
    status = (
        F.when(F.col("n_purch").isNull(), "click_only")
        .when(F.col("n_click").isNull(), "purchase_only")
        .otherwise("both")
    )
    return j.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.coalesce("n_purch", F.lit(0)).cast("long").alias("n_purch"),
        F.coalesce("rev", F.lit(0.0)).alias("rev"),
        F.coalesce("n_click", F.lit(0)).cast("long").alias("n_click"),
        status.alias("status"),
    )


ORACLES["full_outer_recon"] = f"""
    WITH purchases AS (
      SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n_purch,
             {R(sql_sum_money('value'))} AS rev
      FROM events WHERE event_type = 'purchase' AND value > 200.0 GROUP BY 1
    ), clicks AS (
      SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n_click
      FROM events WHERE event_type = 'click' AND value > 200.0 GROUP BY 1
    )
    SELECT strftime(COALESCE(p.d, c.d), '%Y-%m-%d') AS day,
           CAST(COALESCE(p.n_purch, 0) AS BIGINT) AS n_purch,
           COALESCE(p.rev, 0.0) AS rev,
           CAST(COALESCE(c.n_click, 0) AS BIGINT) AS n_click,
           CASE WHEN p.d IS NULL THEN 'click_only'
                WHEN c.d IS NULL THEN 'purchase_only'
                ELSE 'both' END AS status
    FROM purchases p FULL OUTER JOIN clicks c ON p.d = c.d
"""
QUERIES["full_outer_recon"] = q_full_outer_recon


def q_suggest_rbo(spark, sf):
    """Ranking churn between two suggestion builds via truncated
    Rank-Biased Overlap (Webber, Moffat & Zobel 2010): the autocomplete
    top-3 from the FULL corpus vs the build with a 10% slice removed
    (doc_id % 10 == 0 — the "one shard was late" release scenario),
    RBO@3 with p = 0.9 per shared prefix, then the churn distribution —
    the release-gate metric for "how much did the ranking move between
    builds"; most prefixes should hold stable and the late shard's
    prefixes churn. Truncated RBO@k = (1-p)/(1-p^k) * sum_{{d=1..k}}
    p^(d-1) * |A_d ∩ B_d| / d (normalized so identical lists score 1),
    computed from rank-position joins — no list collection."""
    k, p = 3, 0.9
    d = _t(spark, sf, "documents")

    def sugg(side):
        half = d if side == 0 else d.where(F.col("doc_id") % 10 != 0)
        q = normalize_queries(half, text_col="text")
        fr = prefix_frequencies(q, max_len=8)
        return top_k_per_group(
            fr,
            group_cols=["prefix"],
            order_by=[F.desc("frequency"), F.asc("query")],
            k=k,
        ).select("prefix", "query", "rk")

    a, b = sugg(0).alias("a"), sugg(1).alias("b")
    # overlap@d for d=1..k: pairs agreeing on query with both ranks <= d
    pair = a.join(
        b,
        (F.col("a.prefix") == F.col("b.prefix"))
        & (F.col("a.query") == F.col("b.query")),
    ).select(
        F.col("a.prefix").alias("prefix"),
        F.greatest("a.rk", "b.rk").alias("meet_rk"),
    )
    weights = {
        dd: (1.0 - p) / (1.0 - p**k) * (p ** (dd - 1)) / dd
        for dd in range(1, k + 1)
    }
    contrib = pair.groupBy("prefix").agg(
        sum(
            (
                F.sum(
                    F.when(F.col("meet_rk") <= dd, 1).otherwise(0)
                ).cast("double")
                * F.lit(w)
                for dd, w in weights.items()
            ),
            start=F.lit(0.0),
        ).alias("rbo_raw")
    )
    shared = (
        a.select("prefix").distinct().join(b.select("prefix").distinct(), "prefix")
    )
    scored = shared.join(contrib, "prefix", "left").select(
        "prefix", F.coalesce("rbo_raw", F.lit(0.0)).alias("rbo")
    )
    return scored.agg(
        F.count(F.lit(1)).cast("long").alias("n_shared_prefixes"),
        round4(F.avg("rbo")).alias("mean_rbo"),
        F.sum(F.when(F.col("rbo") >= 0.9999, 1).otherwise(0))
        .cast("long")
        .alias("n_stable"),
        F.sum(F.when(F.col("rbo") <= 0.0001, 1).otherwise(0))
        .cast("long")
        .alias("n_fully_churned"),
    )


ORACLES["suggest_rbo"] = f"""
    WITH q0 AS (
      SELECT substring(lower(trim(text)), 1, 500) AS query FROM documents
      WHERE text IS NOT NULL AND length(trim(text)) >= 2
    ), q1 AS (
      SELECT substring(lower(trim(text)), 1, 500) AS query FROM documents
      WHERE doc_id % 10 <> 0 AND text IS NOT NULL AND length(trim(text)) >= 2
    ), f0 AS (
      SELECT substring(query, 1, k.k) AS prefix, query, COUNT(*) AS frequency
      FROM q0 CROSS JOIN (VALUES (2),(3),(4),(5),(6),(7),(8)) AS k(k)
      WHERE length(query) >= k.k GROUP BY 1, 2
    ), f1 AS (
      SELECT substring(query, 1, k.k) AS prefix, query, COUNT(*) AS frequency
      FROM q1 CROSS JOIN (VALUES (2),(3),(4),(5),(6),(7),(8)) AS k(k)
      WHERE length(query) >= k.k GROUP BY 1, 2
    ), a AS (
      SELECT prefix, query, rk FROM (
        SELECT prefix, query, ROW_NUMBER() OVER (PARTITION BY prefix
          ORDER BY frequency DESC, query ASC) AS rk FROM f0
      ) WHERE rk <= 3
    ), b AS (
      SELECT prefix, query, rk FROM (
        SELECT prefix, query, ROW_NUMBER() OVER (PARTITION BY prefix
          ORDER BY frequency DESC, query ASC) AS rk FROM f1
      ) WHERE rk <= 3
    ), pair AS (
      SELECT a.prefix, GREATEST(a.rk, b.rk) AS meet_rk
      FROM a JOIN b ON a.prefix = b.prefix AND a.query = b.query
    ), contrib AS (
      SELECT prefix,
             SUM(CASE WHEN meet_rk <= 1 THEN 1 ELSE 0 END)
               * (1.0 - 0.9) / (1.0 - 0.9 * 0.9 * 0.9) * 1.0 / 1
             + SUM(CASE WHEN meet_rk <= 2 THEN 1 ELSE 0 END)
               * (1.0 - 0.9) / (1.0 - 0.9 * 0.9 * 0.9) * 0.9 / 2
             + SUM(CASE WHEN meet_rk <= 3 THEN 1 ELSE 0 END)
               * (1.0 - 0.9) / (1.0 - 0.9 * 0.9 * 0.9) * (0.9 * 0.9) / 3
               AS rbo_raw
      FROM pair GROUP BY prefix
    ), shared AS (
      SELECT DISTINCT a.prefix FROM a JOIN b ON a.prefix = b.prefix
    ), scored AS (
      SELECT s.prefix, COALESCE(c.rbo_raw, 0.0) AS rbo
      FROM shared s LEFT JOIN contrib c ON c.prefix = s.prefix
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_shared_prefixes,
           {R("AVG(rbo)")} AS mean_rbo,
           CAST(SUM(CASE WHEN rbo >= 0.9999 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_stable,
           CAST(SUM(CASE WHEN rbo <= 0.0001 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_fully_churned
    FROM scored
"""
QUERIES["suggest_rbo"] = q_suggest_rbo


def q_ece_eval(spark, sf):
    """Expected Calibration Error over 10 fixed-width confidence bins —
    the companion readout to auc_eval (a model can rank perfectly and
    still be badly calibrated): ECE = sum_b (n_b/N) * |acc_b - conf_b|,
    on the same deterministic label-shifted score construction. Fixed
    bins (not quantile bins — the psi_drift lesson); one conditional
    aggregation over the scored relation."""
    e = _events(spark, sf)
    label = F.when(F.col("event_type") == "purchase", 1.0).otherwise(0.0)
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("auc:"), F.col("event_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(4294967296.0)
    )
    raw = F.when(label == 1.0, 0.3 + 0.7 * u).otherwise(0.7 * u)
    s = F.floor(raw * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)
    binned = e.select(
        F.least(F.floor(s * 10).cast("int"), F.lit(9)).alias("bin"),
        s.alias("s"),
        label.alias("y"),
    )
    per_bin = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("double").alias("nb"),
        F.avg("s").alias("conf"),
        F.avg("y").alias("acc"),
    )
    w = Window.partitionBy()
    return per_bin.select(
        "bin",
        F.col("nb").cast("long").alias("n"),
        round4(F.col("conf")).alias("mean_confidence"),
        round4(F.col("acc")).alias("empirical_rate"),
        round4(
            F.sum(
                F.col("nb") * F.abs(F.col("acc") - F.col("conf"))
            ).over(w)
            / F.sum("nb").over(w)
        ).alias("ece"),
    )


ORACLES["ece_eval"] = f"""
    WITH scored AS (
      SELECT floor((CASE WHEN event_type = 'purchase'
                    THEN 0.3 + 0.7 * u ELSE 0.7 * u END)
                   * CAST(1000000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE))
               / CAST(1000000.0 AS DOUBLE) AS s,
             CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS y
      FROM (
        SELECT event_type,
               CAST(CAST('0x' || substr(md5('auc:' || CAST(event_id AS VARCHAR)),
                    1, 8) AS BIGINT) AS DOUBLE) / 4294967296.0 AS u
        FROM events
      )
    ), per_bin AS (
      SELECT LEAST(CAST(FLOOR(s * 10) AS INTEGER), 9) AS bin,
             CAST(COUNT(*) AS DOUBLE) AS nb,
             AVG(s) AS conf, AVG(y) AS acc
      FROM scored GROUP BY 1
    )
    SELECT bin, CAST(nb AS BIGINT) AS n,
           {R("conf")} AS mean_confidence,
           {R("acc")} AS empirical_rate,
           {R("SUM(nb * ABS(acc - conf)) OVER () / SUM(nb) OVER ()")} AS ece
    FROM per_bin
"""
QUERIES["ece_eval"] = q_ece_eval


def q_shapley_attribution(spark, sf):
    """Exact Shapley-value channel attribution (the game-theoretic
    multi-touch model): each non-purchase channel's credit for
    conversions is its average marginal contribution across all
    coalition orderings — phi_i = sum over coalitions S not containing i
    of |S|!(n-|S|-1)!/n! * (v(S+i) - v(S)), with the standard
    counting characteristic v(S) = conversions among users whose entire
    touchset lies inside S. Efficiency (sum phi_i == total conversions)
    is part of the output, so the identity is hash-pinned.

    Scale shape: ONE fact pass builds the per-user (touchset bitmask,
    converted) pair — bit_or of channel bits over events before the
    user's first purchase; everything after runs on the 2^n = 16-row
    mask relation (subset-sum join, coalition-weight join) — the whole
    game solves in dimension space, exactly like the reference funnel
    queries."""
    channels = ["view", "click", "signup", "error"]
    n = len(channels)
    e = _events(spark, sf)
    first_p = e.where(F.col("event_type") == "purchase").groupBy(
        "user_id"
    ).agg(F.min("ts").alias("p_ts"))
    touches = (
        e.join(first_p, "user_id", "left")
        .where(
            F.col("event_type").isin(channels)
            & (F.col("p_ts").isNull() | (F.col("ts") < F.col("p_ts")))
        )
        .select(
            "user_id",
            # shiftleft needs a literal bit count — the channel bit is a
            # CASE ladder instead (identical to the oracle's)
            sum(
                (
                    F.when(F.col("event_type") == c, 1 << i).otherwise(0)
                    for i, c in enumerate(channels)
                ),
                start=F.lit(0),
            ).alias("bit"),
            F.col("p_ts").isNotNull().alias("conv"),
        )
    )
    per_user = touches.groupBy("user_id").agg(
        F.bit_or("bit").alias("mask"),
        F.max(F.col("conv").cast("int")).alias("conv"),
    )
    mask_conv = per_user.groupBy("mask").agg(
        F.sum("conv").cast("double").alias("c")
    )
    coalitions = spark.range(0, 1 << n).select(F.col("id").cast("int").alias("s"))
    v = (
        coalitions.join(
            mask_conv,
            F.expr("(mask & ~s) = 0"),
            "left",
        )
        .groupBy("s")
        .agg(F.coalesce(F.sum("c"), F.lit(0.0)).alias("v"))
    )
    # factorial weights |S|!(n-1-|S|)!/n! for n = 4
    fact = [1, 1, 2, 6, 24]
    weight_arr = F.array(
        *[F.lit(fact[k] * fact[n - 1 - k] / fact[n]) for k in range(n)]
    )
    ch = spark.createDataFrame(
        [(i + 1, c) for i, c in enumerate(channels)], "idx int, channel string"
    )
    va, vb = v.alias("va"), v.alias("vb")
    marginals = (
        ch.crossJoin(va)
        .where(F.expr("(va.s & shiftleft(1, idx - 1)) = 0"))
        .join(
            vb,
            F.expr("vb.s = va.s | shiftleft(1, idx - 1)"),
        )
        .select(
            "channel",
            (
                F.element_at(
                    weight_arr, F.bit_count(F.col("va.s")).cast("int") + 1
                )
                * (F.col("vb.v") - F.col("va.v"))
            ).alias("contrib"),
        )
    )
    phi = marginals.groupBy("channel").agg(F.sum("contrib").alias("phi"))
    total = per_user.agg(F.sum("conv").cast("double").alias("total_conv"))
    return phi.crossJoin(F.broadcast(total)).select(
        "channel",
        round4(F.col("phi")).alias("shapley_credit"),
        round4(F.col("phi") / F.col("total_conv")).alias("credit_share"),
        F.col("total_conv").cast("long").alias("total_conversions"),
    )


ORACLES["shapley_attribution"] = f"""
    WITH first_p AS (
      SELECT user_id, MIN(ts) AS p_ts FROM events
      WHERE event_type = 'purchase' GROUP BY user_id
    ), touches AS (
      SELECT e.user_id,
             CASE e.event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
                               WHEN 'signup' THEN 4 WHEN 'error' THEN 8 END AS bit,
             CASE WHEN f.p_ts IS NOT NULL THEN 1 ELSE 0 END AS conv
      FROM events e LEFT JOIN first_p f ON f.user_id = e.user_id
      WHERE e.event_type IN ('view', 'click', 'signup', 'error')
        AND (f.p_ts IS NULL OR e.ts < f.p_ts)
    ), per_user AS (
      SELECT user_id, bit_or(bit) AS mask, MAX(conv) AS conv
      FROM touches GROUP BY user_id
    ), mask_conv AS (
      SELECT mask, CAST(SUM(conv) AS DOUBLE) AS c FROM per_user GROUP BY mask
    ), coalitions AS (
      SELECT CAST(s AS INTEGER) AS s FROM UNNEST(range(0, 16)) AS t(s)
    ), v AS (
      SELECT co.s, COALESCE(SUM(m.c), 0.0) AS v
      FROM coalitions co LEFT JOIN mask_conv m ON (m.mask & ~co.s) = 0
      GROUP BY co.s
    ), ch(idx, channel) AS (
      VALUES (1, 'view'), (2, 'click'), (3, 'signup'), (4, 'error')
    ), weights(k, w) AS (
      VALUES (0, 0.25), (1, CAST(1.0 AS DOUBLE) / 12.0),
             (2, CAST(1.0 AS DOUBLE) / 12.0), (3, 0.25)
    ), marginals AS (
      SELECT ch.channel,
             w.w * (vb.v - va.v) AS contrib
      FROM ch
      JOIN v va ON (va.s & (1 << (ch.idx - 1))) = 0
      JOIN v vb ON vb.s = va.s | (1 << (ch.idx - 1))
      JOIN weights w ON w.k = bit_count(va.s)
    ), phi AS (
      SELECT channel, SUM(contrib) AS phi FROM marginals GROUP BY channel
    ), total AS (
      SELECT CAST(SUM(conv) AS DOUBLE) AS total_conv FROM per_user
    )
    SELECT channel,
           {R("phi")} AS shapley_credit,
           {R("phi / total.total_conv")} AS credit_share,
           CAST(total.total_conv AS BIGINT) AS total_conversions
    FROM phi, total
"""
QUERIES["shapley_attribution"] = q_shapley_attribution


def q_did_estimate(spark, sf):
    """Difference-in-differences estimator on the classic 2x2 panel:
    treatment = deterministic user-hash bit (the portable-hash
    discipline — the assignment an experiment platform would persist),
    post = second half of the observation window, outcome = purchase
    value. DiD = (T,post - T,pre) - (C,post - C,pre), reported with the
    four cell means, cell sizes, and the large-sample standard error
    sqrt(sum s_c^2/n_c) — one conditional-aggregation pass over the
    fact table, everything else scalar."""
    e = _events(spark, sf).where(F.col("event_type") == "purchase")
    treat = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("did:"), F.col("user_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 2
        == 0
    )
    post = F.to_date("ts") >= F.lit("2024-01-16")
    cells = e.select(
        treat.cast("int").alias("t"),
        post.cast("int").alias("p"),
        F.col("value").alias("y"),
    ).groupBy("t", "p").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("y").alias("m"),
        F.var_pop("y").alias("v"),
    )
    w = Window.partitionBy()
    pick = lambda t, p, col: F.max(
        F.when((F.col("t") == t) & (F.col("p") == p), F.col(col))
    ).over(w)
    out = cells.select(
        pick(1, 1, "m").alias("t_post"),
        pick(1, 0, "m").alias("t_pre"),
        pick(0, 1, "m").alias("c_post"),
        pick(0, 0, "m").alias("c_pre"),
        (
            pick(1, 1, "v") / pick(1, 1, "n")
            + pick(1, 0, "v") / pick(1, 0, "n")
            + pick(0, 1, "v") / pick(0, 1, "n")
            + pick(0, 0, "v") / pick(0, 0, "n")
        ).alias("var_did"),
        (
            pick(1, 1, "n") + pick(1, 0, "n") + pick(0, 1, "n") + pick(0, 0, "n")
        ).alias("n_total"),
    ).limit(1)
    did = (F.col("t_post") - F.col("t_pre")) - (
        F.col("c_post") - F.col("c_pre")
    )
    return out.select(
        F.col("n_total").cast("long").alias("n_obs"),
        round4(F.col("t_pre")).alias("treat_pre"),
        round4(F.col("t_post")).alias("treat_post"),
        round4(F.col("c_pre")).alias("control_pre"),
        round4(F.col("c_post")).alias("control_post"),
        round4(did).alias("did"),
        round4(F.sqrt(F.col("var_did"))).alias("se"),
    )


ORACLES["did_estimate"] = f"""
    WITH cells AS (
      SELECT CASE WHEN CAST('0x' || substr(md5('did:' || CAST(user_id AS VARCHAR)),
                    1, 8) AS BIGINT) % 2 = 0 THEN 1 ELSE 0 END AS t,
             CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-16' THEN 1 ELSE 0 END AS p,
             value AS y
      FROM events WHERE event_type = 'purchase'
    ), agg AS (
      SELECT t, p, CAST(COUNT(*) AS DOUBLE) AS n, AVG(y) AS m,
             var_pop(y) AS v
      FROM cells GROUP BY t, p
    ), pv AS (
      SELECT MAX(CASE WHEN t = 1 AND p = 1 THEN m END) AS t_post,
             MAX(CASE WHEN t = 1 AND p = 0 THEN m END) AS t_pre,
             MAX(CASE WHEN t = 0 AND p = 1 THEN m END) AS c_post,
             MAX(CASE WHEN t = 0 AND p = 0 THEN m END) AS c_pre,
             MAX(CASE WHEN t = 1 AND p = 1 THEN v / n END)
               + MAX(CASE WHEN t = 1 AND p = 0 THEN v / n END)
               + MAX(CASE WHEN t = 0 AND p = 1 THEN v / n END)
               + MAX(CASE WHEN t = 0 AND p = 0 THEN v / n END) AS var_did,
             SUM(n) AS n_total
      FROM agg
    )
    SELECT CAST(n_total AS BIGINT) AS n_obs,
           {R("t_pre")} AS treat_pre,
           {R("t_post")} AS treat_post,
           {R("c_pre")} AS control_pre,
           {R("c_post")} AS control_post,
           {R("(t_post - t_pre) - (c_post - c_pre)")} AS did,
           {R("SQRT(var_did)")} AS se
    FROM pv
"""
QUERIES["did_estimate"] = q_did_estimate


def q_qini_uplift(spark, sf):
    """Uplift-model evaluation via the Qini curve: users split into a
    deterministic treatment/control (hash bit), scored by a
    deterministic targeting score, bucketed into deciles by score, and
    the per-decile INCREMENTAL conversions (treated-rate minus
    control-rate, scaled to the treated count) accumulate into the Qini
    curve; the endpoint is the overall incremental lift and the curve
    shape is what a targeting model is judged on. Deciles come from
    NTILE semantics over the per-user relation (users, not events — the
    correct uplift unit), computed since round 9 as arithmetic on an
    exact range-partitioned global rank (operators/rank.py — the user
    dimension is corpus-scale, so no unpartitioned window may see it);
    everything else is conditional aggregation + one cumulative window
    over 10 rows."""
    e = _events(spark, sf)
    per_user = e.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted"),
        F.count(F.lit(1)).cast("double").alias("n_events"),
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("uplift:"), F.col("user_id").cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    scored = per_user.select(
        "converted",
        "user_id",
        (h % 2 == 0).cast("int").alias("treat"),
        # deterministic targeting score: activity blended with a hash
        (F.col("n_events") * 1000.0 + (h % 997).cast("double")).alias("score"),
    )
    from batch_processing_pipeline_spark.operators.rank import (
        exact_global_ntile,
    )

    # user_id tie-break gives NTILE a TOTAL order — equal scores would
    # otherwise bucket engine-dependently; the row count rides the rank
    # helper's P-row counts relation (no second corpus aggregation)
    binned = exact_global_ntile(
        scored,
        [F.col("score").desc(), F.col("user_id").asc()],
        k=10,
        out_col="decile",
    ).select("converted", "treat", "decile")
    per_dec = binned.groupBy("decile").agg(
        F.sum(F.when(F.col("treat") == 1, F.col("converted"))).cast("double").alias("conv_t"),
        F.sum("treat").cast("double").alias("n_t"),
        F.sum(F.when(F.col("treat") == 0, F.col("converted"))).cast("double").alias("conv_c"),
        F.sum(F.when(F.col("treat") == 0, 1).otherwise(0)).cast("double").alias("n_c"),
    )
    w_cum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    # empty arms (possible in tiny deciles) contribute 0, not NULL — the
    # curve must stay summable at every scale factor
    incr = F.coalesce("conv_t", F.lit(0.0)) - F.when(
        F.col("n_c") > 0,
        F.coalesce("conv_c", F.lit(0.0)) * F.col("n_t") / F.col("n_c"),
    ).otherwise(F.lit(0.0))
    return per_dec.select(
        "decile",
        F.col("n_t").cast("long").alias("n_treated"),
        F.col("n_c").cast("long").alias("n_control"),
        round4(incr).alias("incremental"),
        round4(F.sum(incr).over(w_cum)).alias("qini_cum"),
    )


ORACLES["qini_uplift"] = f"""
    WITH per_user AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted,
             CAST(COUNT(*) AS DOUBLE) AS n_events
      FROM events GROUP BY user_id
    ), scored AS (
      SELECT converted, user_id,
             CASE WHEN CAST('0x' || substr(md5('uplift:' || CAST(user_id AS VARCHAR)),
                    1, 8) AS BIGINT) % 2 = 0 THEN 1 ELSE 0 END AS treat,
             n_events * 1000.0
               + CAST(CAST('0x' || substr(md5('uplift:' || CAST(user_id AS VARCHAR)),
                      1, 8) AS BIGINT) % 997 AS DOUBLE) AS score
      FROM per_user
    ), binned AS (
      SELECT converted, treat,
             NTILE(10) OVER (ORDER BY score DESC, user_id ASC) AS decile
      FROM scored
    ), per_dec AS (
      SELECT decile,
             CAST(SUM(CASE WHEN treat = 1 THEN converted END) AS DOUBLE) AS conv_t,
             CAST(SUM(treat) AS DOUBLE) AS n_t,
             CAST(SUM(CASE WHEN treat = 0 THEN converted END) AS DOUBLE) AS conv_c,
             CAST(SUM(CASE WHEN treat = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS n_c
      FROM binned GROUP BY decile
    )
    SELECT decile,
           CAST(n_t AS BIGINT) AS n_treated,
           CAST(n_c AS BIGINT) AS n_control,
           {R("COALESCE(conv_t, 0.0) - CASE WHEN n_c > 0 "
              "THEN COALESCE(conv_c, 0.0) * n_t / n_c ELSE 0.0 END")}
             AS incremental,
           {R("SUM(COALESCE(conv_t, 0.0) - CASE WHEN n_c > 0 "
              "THEN COALESCE(conv_c, 0.0) * n_t / n_c ELSE 0.0 END) "
              "OVER (ORDER BY decile "
              "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")} AS qini_cum
    FROM per_dec
"""
QUERIES["qini_uplift"] = q_qini_uplift


def q_changepoint_binseg(spark, sf):
    """Single-changepoint detection by binary segmentation: the split of
    the daily series minimizing SSE_left + SSE_right — the first
    recursion step of the classic binseg/PELT family and the standard
    "did the level shift, and when" audit (complements cusum's
    sequential drift alarm). Closed form from prefix sums: for split
    after day t, SSE(t) = (S2_n - S2_t - (S_n - S_t)^2 / (n - t))
    + (S2_t - S_t^2 / t) — one cumulative window over the
    dimension-sized daily relation, argmin with a deterministic
    tie-break, no per-candidate rescans."""
    e = _events(spark, sf)
    daily = e.groupBy(
        F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("d")
    ).agg(F.count(F.lit(1)).cast("double").alias("x"))
    w_cum = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    pre = daily.select(
        "d",
        F.sum("x").over(w_cum).alias("s"),
        F.sum(F.col("x") * F.col("x")).over(w_cum).alias("s2"),
        F.count(F.lit(1)).over(w_cum).cast("double").alias("t"),
        F.sum("x").over(w_all).alias("sn"),
        F.sum(F.col("x") * F.col("x")).over(w_all).alias("s2n"),
        F.count(F.lit(1)).over(w_all).cast("double").alias("n"),
    ).where(F.col("t") < F.col("n"))
    sse = (
        (F.col("s2") - F.col("s") * F.col("s") / F.col("t"))
        + (
            (F.col("s2n") - F.col("s2"))
            - (F.col("sn") - F.col("s")) * (F.col("sn") - F.col("s"))
            / (F.col("n") - F.col("t"))
        )
    )
    total_sse = F.col("s2n") - F.col("sn") * F.col("sn") / F.col("n")
    scored = pre.select(
        "d",
        sse.alias("sse"),
        total_sse.alias("sse0"),
        (F.col("s") / F.col("t")).alias("mean_pre"),
        ((F.col("sn") - F.col("s")) / (F.col("n") - F.col("t"))).alias(
            "mean_post"
        ),
    )
    w_rank = Window.orderBy(F.col("sse").asc(), F.col("d").asc())
    best = scored.withColumn("rk", F.row_number().over(w_rank)).where(
        F.col("rk") == 1
    )
    return best.select(
        F.col("d").cast("long").alias("split_after_day"),
        round4(F.col("mean_pre")).alias("mean_pre"),
        round4(F.col("mean_post")).alias("mean_post"),
        round4(F.col("sse")).alias("sse_split"),
        round4(F.col("sse0")).alias("sse_null"),
        round4(1.0 - F.col("sse") / F.col("sse0")).alias("var_explained"),
    )


ORACLES["changepoint_binseg"] = f"""
    WITH daily AS (
      SELECT CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS d,
             CAST(COUNT(*) AS DOUBLE) AS x
      FROM events GROUP BY 1
    ), pre AS (
      SELECT d,
             SUM(x) OVER w AS s,
             SUM(x * x) OVER w AS s2,
             CAST(COUNT(*) OVER w AS DOUBLE) AS t,
             SUM(x) OVER () AS sn,
             SUM(x * x) OVER () AS s2n,
             CAST(COUNT(*) OVER () AS DOUBLE) AS n
      FROM daily
      WINDOW w AS (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), scored AS (
      SELECT d,
             (s2 - s * s / t)
               + ((s2n - s2) - (sn - s) * (sn - s) / (n - t)) AS sse,
             s2n - sn * sn / n AS sse0,
             s / t AS mean_pre,
             (sn - s) / (n - t) AS mean_post
      FROM pre WHERE t < n
    )
    SELECT CAST(d AS BIGINT) AS split_after_day,
           {R("mean_pre")} AS mean_pre,
           {R("mean_post")} AS mean_post,
           {R("sse")} AS sse_split,
           {R("sse0")} AS sse_null,
           {R("1.0 - sse / sse0")} AS var_explained
    FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY sse ASC, d ASC) AS rk FROM scored
    ) WHERE rk = 1
"""
QUERIES["changepoint_binseg"] = q_changepoint_binseg


def q_capture_recapture(spark, sf):
    """Capture-recapture population estimate (Chapman's bias-corrected
    Lincoln-Petersen): treat week-1 and week-2 active users as the two
    capture occasions; N-hat = (n1+1)(n2+1)/(m+1) - 1 with the standard
    variance — the audit for "how many users exist that we never saw",
    the user-population twin of vocab_coverage's unseen-mass estimate.
    Three distinct-count aggregates over one pass."""
    e = _events(spark, sf)
    wk = F.floor(
        F.datediff(F.to_date("ts"), F.lit("2024-01-01")) / 7
    )
    per_user = e.groupBy("user_id").agg(
        F.max((wk == 0).cast("int")).alias("w1"),
        F.max((wk == 1).cast("int")).alias("w2"),
    )
    agg = per_user.agg(
        F.sum("w1").cast("double").alias("n1"),
        F.sum("w2").cast("double").alias("n2"),
        F.sum(F.col("w1") * F.col("w2")).cast("double").alias("m"),
        F.count(F.lit(1)).cast("long").alias("observed_total"),
    )
    nhat = (F.col("n1") + 1) * (F.col("n2") + 1) / (F.col("m") + 1) - 1
    var = (
        (F.col("n1") + 1)
        * (F.col("n2") + 1)
        * (F.col("n1") - F.col("m"))
        * (F.col("n2") - F.col("m"))
        / ((F.col("m") + 1) * (F.col("m") + 1) * (F.col("m") + 2))
    )
    return agg.select(
        F.col("n1").cast("long").alias("n_week1"),
        F.col("n2").cast("long").alias("n_week2"),
        F.col("m").cast("long").alias("n_both"),
        "observed_total",
        round4(nhat).alias("n_hat"),
        round4(F.sqrt(var)).alias("se"),
    )


ORACLES["capture_recapture"] = f"""
    WITH per_user AS (
      SELECT user_id,
             MAX(CASE WHEN (CAST(ts AS DATE) - DATE '2024-01-01') // 7 = 0
                      THEN 1 ELSE 0 END) AS w1,
             MAX(CASE WHEN (CAST(ts AS DATE) - DATE '2024-01-01') // 7 = 1
                      THEN 1 ELSE 0 END) AS w2
      FROM events GROUP BY user_id
    ), agg AS (
      SELECT CAST(SUM(w1) AS DOUBLE) AS n1, CAST(SUM(w2) AS DOUBLE) AS n2,
             CAST(SUM(w1 * w2) AS DOUBLE) AS m,
             CAST(COUNT(*) AS BIGINT) AS observed_total
      FROM per_user
    )
    SELECT CAST(n1 AS BIGINT) AS n_week1,
           CAST(n2 AS BIGINT) AS n_week2,
           CAST(m AS BIGINT) AS n_both,
           observed_total,
           {R("(n1 + 1) * (n2 + 1) / (m + 1) - 1")} AS n_hat,
           {R("SQRT((n1 + 1) * (n2 + 1) * (n1 - m) * (n2 - m) "
              "/ ((m + 1) * (m + 1) * (m + 2)))")} AS se
    FROM agg
"""
QUERIES["capture_recapture"] = q_capture_recapture


def q_gini_concentration(spark, sf):
    """Revenue-concentration audit per market segment: the exact Gini
    coefficient (from the Lorenz curve's trapezoid sum over customers
    sorted by revenue — G = 1 - sum((L_i + L_{{i-1}}) * 1/n)) plus the
    Herfindahl-Hirschman index (sum of squared revenue shares) — the two
    standard inequality/concentration measures a marketplace health
    review reads together. One fact-table rollup to customer revenue,
    then per-segment cumulative windows over the customer relation;
    deterministic (revenue, custkey) ordering makes the Lorenz sum
    exact."""
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    rev = (
        o.groupBy("o_custkey")
        .agg(F.sum(cents(F.col("o_totalprice"))).alias("r"))
        .join(
            c.select(
                F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
            ),
            "o_custkey",
        )
    )
    w_cum = Window.partitionBy("c_mktsegment").orderBy(
        F.col("r").asc(), F.col("o_custkey").asc()
    ).rowsBetween(Window.unboundedPreceding, 0)
    w_seg = Window.partitionBy("c_mktsegment")
    # r/cum/tot are exact long CENTS (r12 sweep — the per-customer rollup
    # and both windows are order-free integer sums). The lorenz2 and sq
    # sums can exceed 2^63 at sf10-class segment sizes (n·tot ≈ 3e20), so
    # they accumulate as DECIMAL(38,0)/HUGEINT — still exact integers; the
    # cents unit cancels in both ratios, and the final int->double
    # conversions are the only float ops (≤1 ulp, engine-identical in
    # practice; divided by a same-unit total so a round4 flip would need
    # a value ~1e12 ulps from the boundary).
    t = rev.select(
        "c_mktsegment",
        "r",
        F.sum("r").over(w_cum).alias("cum"),
        F.sum("r").over(w_seg).alias("tot"),
        F.count(F.lit(1)).over(w_seg).cast("double").alias("n"),
    )
    # trapezoid: G = 1 - sum(2*cum - r) / (n * tot)
    per_seg = t.groupBy("c_mktsegment").agg(
        F.max("n").alias("n"),
        F.max("tot").alias("tot"),
        F.sum(
            (F.lit(2).cast("long") * F.col("cum") - F.col("r")).cast(
                "decimal(38,0)"
            )
        ).alias("lorenz2"),
        F.sum(F.col("r").cast("decimal(19,0)") * F.col("r")).alias("sq"),
    )
    return per_seg.select(
        F.col("c_mktsegment").alias("segment"),
        F.col("n").cast("long").alias("n_customers"),
        round4(
            1.0
            - F.col("lorenz2").cast("double")
            / (F.col("n") * F.col("tot").cast("double"))
        ).alias("gini"),
        round4(
            F.col("sq").cast("double")
            / (F.col("tot").cast("double") * F.col("tot").cast("double"))
        ).alias("hhi"),
    )


ORACLES["gini_concentration"] = f"""
    WITH rev AS (
      SELECT o.o_custkey, SUM({sql_cents('o.o_totalprice')}) AS r, c.c_mktsegment
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY o.o_custkey, c.c_mktsegment
    ), t AS (
      SELECT c_mktsegment, r,
             SUM(r) OVER (PARTITION BY c_mktsegment
               ORDER BY r ASC, o_custkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(r) OVER (PARTITION BY c_mktsegment) AS tot,
             CAST(COUNT(*) OVER (PARTITION BY c_mktsegment) AS DOUBLE) AS n
      FROM rev
    )
    SELECT c_mktsegment AS segment,
           CAST(MAX(n) AS BIGINT) AS n_customers,
           {R("1.0 - CAST(SUM(2 * cum - r) AS DOUBLE) / (MAX(n) * CAST(MAX(tot) AS DOUBLE))")} AS gini,
           {R("CAST(SUM(CAST(r AS HUGEINT) * r) AS DOUBLE) / (CAST(MAX(tot) AS DOUBLE) * CAST(MAX(tot) AS DOUBLE))")} AS hhi
    FROM t GROUP BY c_mktsegment
"""
QUERIES["gini_concentration"] = q_gini_concentration


def q_bm25_search(spark, sf):
    """BM25 document ranking (Robertson/Spärck Jones; k1 = 1.2,
    b = 0.75) for a fixed multi-term query — the modern lexical ranking
    function (tf saturation + length normalization, which raw TF-IDF
    lacks). Corpus statistics (df per term, average doc length) come
    from the standard two aggregations; scoring touches ONLY documents
    containing at least one query term (the inverted-index semi-join
    shape — at corpus scale this is the posting-list traversal); top-20
    with the deterministic md5 tie-break."""
    k1, b = 1.2, 0.75
    terms = ["data", "query", "user", "system"]
    d = _t(spark, sf, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("w"),
    ).where(F.col("w") != "")
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).cast("double").alias("dl"))
    stats = dl.agg(
        F.avg("dl").alias("avgdl"), F.count(F.lit(1)).cast("double").alias("n")
    )
    tf = (
        toks.where(F.col("w").isin(terms))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    df_t = tf.groupBy("w").agg(F.countDistinct("doc_id").cast("double").alias("df"))
    idf = F.log(
        (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    scored = (
        tf.join(F.broadcast(df_t), "w")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            (
                idf
                * F.col("tf")
                * (k1 + 1.0)
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("term_score"),
        )
        .groupBy("doc_id")
        .agg(F.sum("term_score").alias("score"))
    )
    from batch_processing_pipeline_spark.operators.rank import global_topk

    # rank on the ROUND4-ed score: raw-double ordering can flip near-ties
    # on cross-engine ulp drift (partial-agg sum order); equal rounded
    # scores resolve by the md5 tie-break. global_topk: the scored
    # relation is corpus-sized (every doc with >= 1 query term), so the
    # top-20 must be two-phase, not an unpartitioned window (round 9)
    return global_topk(
        scored.select("doc_id", round4(F.col("score")).alias("bm25")),
        [
            F.col("bm25").desc(),
            F.md5(F.col("doc_id").cast("string")).asc(),
        ],
        k=20,
        rank_col="rk",
    ).select("rk", "doc_id", "bm25")


ORACLES["bm25_search"] = f"""
    WITH toks AS (
      SELECT doc_id, w FROM (
        SELECT doc_id,
               unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w
        FROM documents
      ) WHERE w <> ''
    ), dl AS (
      SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS dl FROM toks GROUP BY doc_id
    ), stats AS (
      SELECT AVG(dl) AS avgdl, CAST(COUNT(*) AS DOUBLE) AS n FROM dl
    ), tf AS (
      SELECT doc_id, w, CAST(COUNT(*) AS DOUBLE) AS tf FROM toks
      WHERE w IN ('data', 'query', 'user', 'system')
      GROUP BY doc_id, w
    ), df_t AS (
      SELECT w, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df FROM tf GROUP BY w
    ), scored AS (
      SELECT tf.doc_id,
             SUM(ln((stats.n - df_t.df + 0.5) / (df_t.df + 0.5) + 1.0)
                 * tf.tf * (1.2 + 1.0)
                 / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl)))
               AS score
      FROM tf
      JOIN df_t ON df_t.w = tf.w
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats
      GROUP BY tf.doc_id
    )
    SELECT rk, doc_id, bm25 FROM (
      SELECT doc_id, {R("score")} AS bm25,
             ROW_NUMBER() OVER (ORDER BY {R("score")} DESC,
               md5(CAST(doc_id AS VARCHAR)) ASC) AS rk
      FROM scored
    ) WHERE rk <= 20
"""
QUERIES["bm25_search"] = q_bm25_search


def q_rendezvous_sharding(spark, sf):
    """Rendezvous (highest-random-weight) sharding audit — the
    consistent-assignment scheme behind cache/shard routing: each key
    goes to the shard with the highest hash(key, shard), so adding a
    shard moves ONLY the keys the new shard now wins (~1/(n+1) of them)
    and no key ever moves between surviving shards. The query assigns
    every doc to 8 shards and again to 9, then reports per-shard-count
    balance and the movement audit; the zero-cross-movement invariant is
    part of the output, so the guarantee itself is hash-pinned.

    Per key the argmax folds over a literal shard array (GREATEST over
    n columns — scan-speed, no join); the portable md5 hash keeps both
    engines bit-identical."""
    d = _t(spark, sf, "documents").select("doc_id")

    def weight(shard):
        return F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(f"shard{shard}:"),
                        F.col("doc_id").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")

    def assign(n_shards):
        # argmax via struct max: (weight, shard) pairs, pick max weight
        pairs = F.array(
            *[
                F.struct(weight(s).alias("w"), F.lit(s).alias("shard"))
                for s in range(n_shards)
            ]
        )
        return F.array_max(pairs)["shard"]

    a = d.select(
        "doc_id",
        assign(8).alias("shard8"),
        assign(9).alias("shard9"),
    )
    per_shard = a.groupBy("shard9").agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum(
            F.when(F.col("shard8") != F.col("shard9"), 1).otherwise(0)
        ).cast("long").alias("n_moved_in"),
        # the HRW guarantee: every moved key lands on the NEW shard (8)
        F.sum(
            F.when(
                (F.col("shard8") != F.col("shard9")) & (F.col("shard9") != 8),
                1,
            ).otherwise(0)
        ).cast("long").alias("n_cross_moves"),
    )
    return per_shard.select(
        F.col("shard9").cast("int").alias("shard"),
        "n_keys",
        "n_moved_in",
        "n_cross_moves",
    )


def _hrw_weight_sql(shard: int) -> str:
    return (
        f"CAST('0x' || substr(md5('shard{shard}:' || CAST(doc_id AS VARCHAR)),"
        " 1, 8) AS BIGINT)"
    )


def _hrw_assign_sql(n_shards: int) -> str:
    pairs = ", ".join(
        f"ROW({_hrw_weight_sql(s)}, {s})" for s in range(n_shards)
    )
    # list_max over ROW(weight, shard) orders lexicographically like
    # Spark's array_max over struct(w, shard)
    return f"list_max([{pairs}])[2]"


ORACLES["rendezvous_sharding"] = f"""
    WITH a AS (
      SELECT doc_id,
             {_hrw_assign_sql(8)} AS shard8,
             {_hrw_assign_sql(9)} AS shard9
      FROM documents
    )
    SELECT CAST(shard9 AS INTEGER) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(CASE WHEN shard8 <> shard9 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_moved_in,
           CAST(SUM(CASE WHEN shard8 <> shard9 AND shard9 <> 8
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_cross_moves
    FROM a GROUP BY shard9
"""
QUERIES["rendezvous_sharding"] = q_rendezvous_sharding


def q_evt_pot(spark, sf):
    """Extreme-value analysis by peaks-over-threshold: exceedances of
    `value` above a fixed threshold u fit a Generalized Pareto
    Distribution by the closed-form method of moments (xi = (1 -
    mean^2/var)/2, sigma = mean*(1 + mean^2/var)/2), giving the
    tail-risk readout (exceedance rate, fitted shape/scale, and the
    10x-rarer return level u + sigma/xi*((10)^xi - 1)) — the standard
    operational-risk / anomaly-threshold calibration. One filtered
    moment aggregation; everything downstream is scalar arithmetic."""
    u = 250.0
    e = _events(spark, sf).where(F.col("value") > u)
    tot = _events(spark, sf).agg(F.count(F.lit(1)).cast("double").alias("n_all"))
    agg = e.agg(
        F.count(F.lit(1)).cast("double").alias("k"),
        F.avg(F.col("value") - u).alias("m"),
        F.var_pop(F.col("value") - u).alias("v"),
    )
    r = F.col("m") * F.col("m") / F.col("v")
    xi = 0.5 * (1.0 - r)
    sigma = 0.5 * F.col("m") * (1.0 + r)
    ret10 = F.lit(u) + sigma / xi * (F.pow(F.lit(10.0), xi) - 1.0)
    return agg.crossJoin(F.broadcast(tot)).select(
        F.col("k").cast("long").alias("n_exceedances"),
        round4(F.col("k") / F.col("n_all")).alias("exceed_rate"),
        round4(F.col("m")).alias("mean_excess"),
        round4(xi).alias("gpd_shape"),
        round4(sigma).alias("gpd_scale"),
        round4(ret10).alias("return_level_10x"),
    )


ORACLES["evt_pot"] = f"""
    WITH exc AS (
      SELECT value - 250.0 AS y FROM events WHERE value > 250.0
    ), tot AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_all FROM events
    ), agg AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS k, AVG(y) AS m, var_pop(y) AS v
      FROM exc
    )
    SELECT CAST(k AS BIGINT) AS n_exceedances,
           {R("k / tot.n_all")} AS exceed_rate,
           {R("m")} AS mean_excess,
           {R("0.5 * (1.0 - m * m / v)")} AS gpd_shape,
           {R("0.5 * m * (1.0 + m * m / v)")} AS gpd_scale,
           {R("250.0 + (0.5 * m * (1.0 + m * m / v)) "
              "/ (0.5 * (1.0 - m * m / v)) "
              "* (POW(10.0, 0.5 * (1.0 - m * m / v)) - 1.0)")}
             AS return_level_10x
    FROM agg, tot
"""
QUERIES["evt_pot"] = q_evt_pot


def q_sql_sugar(spark, sf):
    """Modern SQL sugar surface — GROUP BY ALL (group on every
    non-aggregate select item; kills the classic add-a-column-forget-
    the-group-by bug) and ORDER BY ALL, via the spark.sql entry point.
    Both engines implement the same resolution rule, so the oracle runs
    the IDENTICAL sugar text — the parse itself is what's pinned."""
    _t(spark, sf, "orders").createOrReplaceTempView("orders_sugar")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n,
               CAST(SUM(FLOOR(o_totalprice)) AS BIGINT) AS total_fl
        FROM orders_sugar
        WHERE o_totalprice > 500.0
        GROUP BY ALL
        ORDER BY ALL
        """
    )


ORACLES["sql_sugar"] = """
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(FLOOR(o_totalprice)) AS BIGINT) AS total_fl
    FROM orders
    WHERE o_totalprice > CAST(500.0 AS DOUBLE)
    GROUP BY ALL
    ORDER BY ALL
"""
QUERIES["sql_sugar"] = q_sql_sugar


def q_explode_outer_nulls(spark, sf):
    """NULL-preserving lateral explosion (explode_outer / LEFT JOIN
    UNNEST): documents with NO extracted matches must survive as a NULL
    row — the contract that keeps per-document accounting exact through
    a fan-out (a plain explode silently drops them and every downstream
    per-doc count undercounts). Extracts capitalized words; docs without
    any keep one (doc_id, NULL) row; the rollup pins both arms."""
    d = _t(spark, sf, "documents")
    caps = F.regexp_extract_all(F.col("text"), F.lit(r"\b[A-Z][a-z]{2,}"), 0)
    exploded = d.select(
        "doc_id", F.explode_outer(caps).alias("word")
    )
    return exploded.agg(
        F.countDistinct("doc_id").alias("n_docs_total"),
        F.countDistinct(F.when(F.col("word").isNull(), F.col("doc_id"))).alias(
            "n_docs_no_match"
        ),
        F.count("word").alias("n_matches"),
        F.countDistinct("word").alias("n_distinct_words"),
    )


ORACLES["explode_outer_nulls"] = """
    WITH exploded AS (
      SELECT d.doc_id, u.word
      FROM documents d
      LEFT JOIN UNNEST(regexp_extract_all(d.text, '\\b[A-Z][a-z]{2,}', 0))
        AS u(word) ON TRUE
    )
    SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs_total,
           CAST(COUNT(DISTINCT CASE WHEN word IS NULL THEN doc_id END)
                AS BIGINT) AS n_docs_no_match,
           CAST(COUNT(word) AS BIGINT) AS n_matches,
           CAST(COUNT(DISTINCT word) AS BIGINT) AS n_distinct_words
    FROM exploded
"""
QUERIES["explode_outer_nulls"] = q_explode_outer_nulls


def q_listagg_funcs(spark, sf):
    """LISTAGG / string_agg surface (Spark 4.0's ANSI string
    aggregation): the ordered, delimited concatenation every report
    hand-writes with collect_list + array_join — here as the engine
    builtin with an explicit WITHIN GROUP ordering, which is the whole
    contract (an unordered listagg is nondeterministic under
    partitioning). Top-3 regions' nations per region, ordered by name;
    DuckDB's string_agg(x, ',' ORDER BY x) is the exact twin."""
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region")
    j = n.join(
        r.select(F.col("r_regionkey").alias("n_regionkey"), "r_name"),
        "n_regionkey",
    )
    return (
        j.groupBy("r_name")
        .agg(
            F.listagg(F.col("n_name"), F.lit(",")).alias("_raw"),
            F.count(F.lit(1)).alias("n_nations"),
        )
        .select(
            "r_name",
            "n_nations",
            # Spark's listagg has no WITHIN GROUP order in the DataFrame
            # API yet — impose the contract by sorting the split result
            # (portable and deterministic on both engines)
            F.array_join(
                F.array_sort(F.split(F.col("_raw"), ",", -1)), ","
            ).alias("nations"),
        )
    )


ORACLES["listagg_funcs"] = """
    SELECT r.r_name, CAST(COUNT(*) AS BIGINT) AS n_nations,
           string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations
    FROM nation n JOIN region r ON r.r_regionkey = n.n_regionkey
    GROUP BY r.r_name
"""
QUERIES["listagg_funcs"] = q_listagg_funcs


def q_corr_matrix(spark, sf):
    """Pairwise Pearson correlation matrix between the event types'
    daily-count series — the dependence screen behind dashboard "metric
    X moves with metric Y" callouts. The fact table collapses to the
    (day, type) grid once; the matrix is a self-join of that
    dimension-sized grid on day with one moment aggregation per pair
    (k^2 rows for k types, never a fact-table rescans); the diagonal
    rides along as the r = 1 sanity anchor. Deterministic pair order
    (ta <= tb)."""
    e = _events(spark, sf)
    grid = e.groupBy(
        F.to_date("ts").alias("d"), "event_type"
    ).agg(F.count(F.lit(1)).cast("double").alias("x"))
    a, b = grid.alias("a"), grid.alias("b")
    pairs = (
        a.join(b, F.col("a.d") == F.col("b.d"))
        .where(F.col("a.event_type") <= F.col("b.event_type"))
        .groupBy(
            F.col("a.event_type").alias("ta"),
            F.col("b.event_type").alias("tb"),
        )
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum("a.x").alias("sx"),
            F.sum("b.x").alias("sy"),
            F.sum(F.col("a.x") * F.col("a.x")).alias("sxx"),
            F.sum(F.col("b.x") * F.col("b.x")).alias("syy"),
            F.sum(F.col("a.x") * F.col("b.x")).alias("sxy"),
        )
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return pairs.select(
        "ta",
        "tb",
        F.col("n").cast("long").alias("n_days"),
        round4(F.when(den > 0, num / den)).alias("pearson_r"),
    )


ORACLES["corr_matrix"] = f"""
    WITH grid AS (
      SELECT CAST(ts AS DATE) AS d, event_type,
             CAST(COUNT(*) AS DOUBLE) AS x
      FROM events GROUP BY 1, 2
    ), pairs AS (
      SELECT a.event_type AS ta, b.event_type AS tb,
             CAST(COUNT(*) AS DOUBLE) AS n,
             SUM(a.x) AS sx, SUM(b.x) AS sy,
             SUM(a.x * a.x) AS sxx, SUM(b.x * b.x) AS syy,
             SUM(a.x * b.x) AS sxy
      FROM grid a JOIN grid b ON a.d = b.d
      WHERE a.event_type <= b.event_type
      GROUP BY 1, 2
    )
    SELECT ta, tb, CAST(n AS BIGINT) AS n_days,
           {R("CASE WHEN SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)) > 0 "
              "THEN (n * sxy - sx * sy) "
              "/ SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)) END")}
             AS pearson_r
    FROM pairs
"""
QUERIES["corr_matrix"] = q_corr_matrix


def q_runs_test(spark, sf):
    """Wald-Wolfowitz runs test for randomness of the daily event-count
    series about its median: too few runs = trend/clustering, too many
    = oscillation — the standard process-control check that a series is
    noise before anyone fits a model to it. Runs come from one LAG over
    the dimension-sized daily relation; the z-statistic uses the exact
    conditional mean/variance mu = 2*n1*n2/n + 1,
    var = (mu-1)(mu-2)/(n-1); days AT the median drop (the standard
    treatment)."""
    e = _events(spark, sf)
    daily = e.groupBy(
        F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("d")
    ).agg(F.count(F.lit(1)).cast("double").alias("x"))
    med = daily.agg(F.percentile("x", F.lit(0.5)).alias("m"))
    signed = (
        daily.crossJoin(F.broadcast(med))
        .where(F.col("x") != F.col("m"))
        .select("d", (F.col("x") > F.col("m")).cast("int").alias("s"))
    )
    w = Window.orderBy("d")
    runs = signed.select(
        "s",
        F.when(
            F.lag("s").over(w).isNull()
            | (F.lag("s").over(w) != F.col("s")),
            1,
        ).otherwise(0).alias("new_run"),
    )
    agg = runs.agg(
        F.sum("new_run").cast("double").alias("r"),
        F.sum("s").cast("double").alias("n1"),
        F.sum(1 - F.col("s")).cast("double").alias("n2"),
    )
    n = F.col("n1") + F.col("n2")
    mu = 2.0 * F.col("n1") * F.col("n2") / n + 1.0
    var = (mu - 1.0) * (mu - 2.0) / (n - 1.0)
    return agg.select(
        F.col("r").cast("long").alias("n_runs"),
        F.col("n1").cast("long").alias("n_above"),
        F.col("n2").cast("long").alias("n_below"),
        round4(mu).alias("expected_runs"),
        round4(
            F.when(var > 0, (F.col("r") - mu) / F.sqrt(var))
        ).alias("z_score"),
    )


ORACLES["runs_test"] = f"""
    WITH daily AS (
      SELECT CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS d,
             CAST(COUNT(*) AS DOUBLE) AS x
      FROM events GROUP BY 1
    ), med AS (
      SELECT quantile_cont(x, 0.5) AS m FROM daily
    ), signed AS (
      SELECT d, CASE WHEN x > med.m THEN 1 ELSE 0 END AS s
      FROM daily, med WHERE x <> med.m
    ), runs AS (
      SELECT s,
             CASE WHEN LAG(s) OVER (ORDER BY d) IS NULL
                    OR LAG(s) OVER (ORDER BY d) <> s
                  THEN 1 ELSE 0 END AS new_run
      FROM signed
    ), agg AS (
      SELECT CAST(SUM(new_run) AS DOUBLE) AS r,
             CAST(SUM(s) AS DOUBLE) AS n1,
             CAST(SUM(1 - s) AS DOUBLE) AS n2
      FROM runs
    )
    SELECT CAST(r AS BIGINT) AS n_runs,
           CAST(n1 AS BIGINT) AS n_above,
           CAST(n2 AS BIGINT) AS n_below,
           {R("2.0 * n1 * n2 / (n1 + n2) + 1.0")} AS expected_runs,
           {R("CASE WHEN (2.0 * n1 * n2 / (n1 + n2) + 1.0 - 1.0) "
              "* (2.0 * n1 * n2 / (n1 + n2) + 1.0 - 2.0) / (n1 + n2 - 1.0) > 0 "
              "THEN (r - (2.0 * n1 * n2 / (n1 + n2) + 1.0)) "
              "/ SQRT((2.0 * n1 * n2 / (n1 + n2) + 1.0 - 1.0) "
              "* (2.0 * n1 * n2 / (n1 + n2) + 1.0 - 2.0) / (n1 + n2 - 1.0)) END")}
             AS z_score
    FROM agg
"""
QUERIES["runs_test"] = q_runs_test


def q_seasonal_strength(spark, sf):
    """Seasonal/trend strength of the daily series (Hyndman's
    forecastability decomposition): F_seasonal = max(0, 1 -
    var(remainder)/var(detrended)) and F_trend = max(0, 1 -
    var(remainder)/var(deseasonalized)) over the same moving-average
    STL split as stl_decompose — the one-number answer to "is this
    series worth a seasonal model". Interior days only (where the
    centered trend exists); same exact-integer detrended carries, so
    both engines agree bit-for-bit before the final divisions."""
    e = _events(spark, sf)
    daily = e.groupBy(
        F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("d")
    ).agg(F.count(F.lit(1)).cast("double").alias("x"))
    w7 = Window.orderBy("d").rowsBetween(-3, 3)
    t = daily.select(
        "d",
        "x",
        F.when(
            F.count(F.lit(1)).over(w7) == 7, F.sum("x").over(w7)
        ).alias("s7"),
        (F.col("d") % 7).alias("dow"),
    ).where(F.col("s7").isNotNull())
    w_dow = Window.partitionBy("dow")
    t2 = t.select(
        "d",
        "x",
        "s7",
        (7.0 * F.col("x") - F.col("s7")).alias("detr7"),
        F.sum(7.0 * F.col("x") - F.col("s7")).over(w_dow).alias("sd"),
        F.count(F.lit(1)).over(w_dow).alias("nd"),
    )
    trend = F.col("s7") / 7.0
    seasonal = F.col("sd") / (7.0 * F.col("nd"))
    comp = t2.select(
        (F.col("x") - trend).alias("detrended"),
        (F.col("x") - seasonal).alias("deseasonalized"),
        (F.col("x") - trend - seasonal).alias("remainder"),
    )
    agg = comp.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.var_pop("detrended").alias("v_dt"),
        F.var_pop("deseasonalized").alias("v_ds"),
        F.var_pop("remainder").alias("v_r"),
    )
    return agg.select(
        "n_days",
        round4(
            F.greatest(F.lit(0.0), 1.0 - F.col("v_r") / F.col("v_dt"))
        ).alias("f_seasonal"),
        round4(
            F.greatest(F.lit(0.0), 1.0 - F.col("v_r") / F.col("v_ds"))
        ).alias("f_trend"),
    )


ORACLES["seasonal_strength"] = f"""
    WITH daily AS (
      SELECT CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS d,
             CAST(COUNT(*) AS DOUBLE) AS x
      FROM events GROUP BY 1
    ), t AS (
      SELECT d, x,
             CASE WHEN COUNT(*) OVER w = 7 THEN SUM(x) OVER w END AS s7,
             d % 7 AS dow
      FROM daily
      WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ), ti AS (
      SELECT * FROM t WHERE s7 IS NOT NULL
    ), t2 AS (
      SELECT d, x, s7,
             SUM(7.0 * x - s7) OVER (PARTITION BY dow) AS sd,
             COUNT(*) OVER (PARTITION BY dow) AS nd
      FROM ti
    ), comp AS (
      SELECT x - s7 / 7.0 AS detrended,
             x - sd / (7.0 * nd) AS deseasonalized,
             x - s7 / 7.0 - sd / (7.0 * nd) AS remainder
      FROM t2
    ), agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
             var_pop(detrended) AS v_dt,
             var_pop(deseasonalized) AS v_ds,
             var_pop(remainder) AS v_r
      FROM comp
    )
    SELECT n_days,
           {R("GREATEST(0.0, 1.0 - v_r / v_dt)")} AS f_seasonal,
           {R("GREATEST(0.0, 1.0 - v_r / v_ds)")} AS f_trend
    FROM agg
"""
QUERIES["seasonal_strength"] = q_seasonal_strength


def q_session_entropy(spark, sf):
    """Per-user behavioral diversity: Shannon entropy of each user's
    event-type mix, rolled into the population distribution (mean
    entropy, share of single-minded users, max possible ln k) — the
    engagement-breadth metric that separates "does one thing" from
    "explores the product". Per-user terms fold into two hash
    aggregations; no per-user collection."""
    e = _events(spark, sf)
    per = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    w_u = Window.partitionBy("user_id")
    terms = per.select(
        "user_id",
        (F.col("c") / F.sum("c").over(w_u)).alias("p"),
        F.count(F.lit(1)).over(w_u).alias("k"),
    )
    per_user = terms.groupBy("user_id").agg(
        F.sum(-F.col("p") * F.log("p")).alias("h"),
        F.max("k").alias("k"),
    )
    return per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        round4(F.avg("h")).alias("mean_entropy"),
        round4(
            F.avg(F.when(F.col("k") == 1, 1.0).otherwise(0.0))
        ).alias("single_type_share"),
        round4(F.avg(F.log(F.col("k").cast("double")))).alias(
            "mean_max_entropy"
        ),
    )


ORACLES["session_entropy"] = f"""
    WITH per AS (
      SELECT user_id, event_type, CAST(COUNT(*) AS DOUBLE) AS c
      FROM events GROUP BY 1, 2
    ), terms AS (
      SELECT user_id,
             c / SUM(c) OVER (PARTITION BY user_id) AS p,
             COUNT(*) OVER (PARTITION BY user_id) AS k
      FROM per
    ), per_user AS (
      SELECT user_id, SUM(-p * ln(p)) AS h, MAX(k) AS k
      FROM terms GROUP BY user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           {R("AVG(h)")} AS mean_entropy,
           {R("AVG(CASE WHEN k = 1 THEN 1.0 ELSE 0.0 END)")}
             AS single_type_share,
           {R("AVG(ln(CAST(k AS DOUBLE)))")} AS mean_max_entropy
    FROM per_user
"""
QUERIES["session_entropy"] = q_session_entropy


def q_peak_detection(spark, sf):
    """Local-maximum peak detection with a prominence floor on the daily
    series: a day is a peak iff it strictly exceeds its +-2-day
    neighborhood AND clears the neighborhood minimum by the prominence
    threshold — the alarm-worthy-spike extractor (raw local maxima alone
    fire on noise; the prominence condition is what makes peaks
    reportable). Pure lag/lead windows over the dimension-sized daily
    relation; boundary days (incomplete neighborhoods) are excluded by
    the window-count guard."""
    prom = 0.05  # 5% above the neighborhood floor
    e = _events(spark, sf)
    daily = e.groupBy(
        F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("d")
    ).agg(F.count(F.lit(1)).cast("double").alias("x"))
    w = Window.orderBy("d")
    neigh = [F.lag("x", i).over(w) for i in (1, 2)] + [
        F.lead("x", i).over(w) for i in (1, 2)
    ]
    nmax = F.greatest(*neigh)
    nmin = F.least(*neigh)
    # GREATEST/LEAST skip NULLs in both engines, so the full-neighborhood
    # requirement must be explicit: both 2-step neighbors present (which
    # implies the 1-step ones). Projected first — window functions are
    # not allowed in WHERE.
    flagged = daily.select(
        "d",
        "x",
        nmax.alias("nmax"),
        nmin.alias("nmin"),
        F.lag("x", 2).over(w).alias("_l2"),
        F.lead("x", 2).over(w).alias("_r2"),
    ).where(
        F.col("_l2").isNotNull()
        & F.col("_r2").isNotNull()
        & (F.col("x") > F.col("nmax"))
        & (F.col("x") >= F.col("nmin") * (1.0 + prom))
    )
    return flagged.select(
        F.col("d").cast("long").alias("day_num"),
        F.col("x").cast("long").alias("n_events"),
        round4(F.col("x") / F.col("nmin") - 1.0).alias("prominence"),
    )


ORACLES["peak_detection"] = f"""
    WITH daily AS (
      SELECT CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS d,
             CAST(COUNT(*) AS DOUBLE) AS x
      FROM events GROUP BY 1
    ), n AS (
      SELECT d, x,
             GREATEST(LAG(x, 1) OVER w, LAG(x, 2) OVER w,
                      LEAD(x, 1) OVER w, LEAD(x, 2) OVER w) AS nmax,
             LEAST(LAG(x, 1) OVER w, LAG(x, 2) OVER w,
                   LEAD(x, 1) OVER w, LEAD(x, 2) OVER w) AS nmin
      FROM daily WINDOW w AS (ORDER BY d)
    )
    SELECT CAST(d AS BIGINT) AS day_num,
           CAST(x AS BIGINT) AS n_events,
           {R("x / nmin - 1.0")} AS prominence
    FROM (
      SELECT *, LAG(x, 2) OVER (ORDER BY d) AS l2,
             LEAD(x, 2) OVER (ORDER BY d) AS r2
      FROM n
    )
    WHERE l2 IS NOT NULL AND r2 IS NOT NULL
      AND x > nmax AND x >= nmin * 1.05
"""
QUERIES["peak_detection"] = q_peak_detection


def q_langid_confusion(spark, sf):
    """Confusion-matrix evaluation of the language-ID heuristic against
    the fixture's labeled lang column — the eval loop every classifier
    in the engine should close (text_langid ships predictions; THIS
    query ships its accuracy). Emits the non-empty confusion cells plus
    overall accuracy; disagreement cells are exactly where the stopword
    table needs work. One pass for predictions (the language_id column
    expression), one hash aggregation for the matrix."""
    d = _t(spark, sf, "documents")
    pred = language_id(F.col("text"))
    cells = d.select(
        F.col("lang").alias("actual"), pred.alias("predicted")
    ).groupBy("actual", "predicted").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy()
    return cells.select(
        "actual",
        "predicted",
        "n",
        round4(
            F.sum(
                F.when(F.col("actual") == F.col("predicted"), F.col("n"))
                .otherwise(0)
            ).over(w)
            / F.sum("n").over(w)
        ).alias("overall_accuracy"),
    )


ORACLES["langid_confusion"] = f"""
    WITH pred AS ({_LANGID_ORACLE.strip()})
    SELECT d.lang AS actual, p.lang_pred AS predicted,
           CAST(COUNT(*) AS BIGINT) AS n,
           {R("SUM(SUM(CASE WHEN d.lang = p.lang_pred THEN 1 ELSE 0 END)) OVER () "
              "* 1.0 / SUM(COUNT(*)) OVER ()")} AS overall_accuracy
    FROM documents d JOIN pred p ON p.doc_id = d.doc_id
    GROUP BY d.lang, p.lang_pred
"""
QUERIES["langid_confusion"] = q_langid_confusion


def q_power_analysis(spark, sf):
    """Experiment-design power analysis from observed data: given the
    measured conversion rate per variant-eligible population, the
    required sample size per arm to detect a +10% relative lift at
    alpha = 0.05 (two-sided), power = 0.80 — n = (z_a + z_b)^2 *
    (p1(1-p1) + p2(1-p2)) / (p1 - p2)^2 — and the minimal detectable
    relative effect at the CURRENT population size. The pre-registration
    readout every A/B test needs; one aggregation, then scalar math
    (z constants are fixed literals, identical both engines)."""
    za, zb = 1.959963985, 0.8416212336
    e = _events(spark, sf)
    # conversion = an EXTREME-value purchase (value > 300): the
    # rare-enough outcome (~2-3% of users) that keeps the design problem
    # non-degenerate at every fixture scale — any-purchase and
    # repeat-purchase both saturate toward p1 = 1 on this fixture
    per_user = e.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") > 300.0),
                1,
            ).otherwise(0)
        ).alias("conv")
    )
    agg = per_user.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("conv").alias("p1"),
    )
    p2 = F.col("p1") * 1.1
    var_sum = F.col("p1") * (1 - F.col("p1")) + p2 * (1 - p2)
    # p1 = 0 (nothing to lift) or p2 >= 1 (variance term negative) make
    # the design question ill-posed — NULL in both engines; the p1 = 0
    # guard also keeps ANSI sessions from a divide-by-zero
    n_req = F.when(
        (F.col("p1") > 0.0) & (p2 < 1.0),
        F.lit((za + zb) ** 2)
        * var_sum
        / ((p2 - F.col("p1")) * (p2 - F.col("p1"))),
    )
    # MDE at current n/2 per arm: delta = (za+zb) * sqrt(2*p1(1-p1)/(n/2))
    mde_abs = F.lit(za + zb) * F.sqrt(
        2.0 * F.col("p1") * (1 - F.col("p1")) / (F.col("n") / 2.0)
    )
    return agg.select(
        F.col("n").cast("long").alias("n_users"),
        round4(F.col("p1")).alias("base_rate"),
        round4(n_req).alias("n_per_arm_for_10pct_lift"),
        round4(
            F.when(F.col("p1") > 0.0, mde_abs / F.col("p1"))
        ).alias("mde_relative_at_current_n"),
    )


ORACLES["power_analysis"] = f"""
    WITH per_user AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'purchase' AND value > 300.0
                      THEN 1 ELSE 0 END) AS conv
      FROM events GROUP BY user_id
    ), agg AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(conv) AS p1 FROM per_user
    )
    SELECT CAST(n AS BIGINT) AS n_users,
           {R("p1")} AS base_rate,
           {R("CASE WHEN p1 > 0.0 AND p1 * 1.1 < 1.0 THEN "
              "7.848879737078008 * (p1 * (1 - p1) + p1 * 1.1 * (1 - p1 * 1.1)) "
              "/ ((p1 * 1.1 - p1) * (p1 * 1.1 - p1)) END")}
             AS n_per_arm_for_10pct_lift,
           {R("CASE WHEN p1 > 0.0 THEN "
              "2.8015852185999996 * SQRT(2.0 * p1 * (1 - p1) / (n / 2.0)) / p1 END")}
             AS mde_relative_at_current_n
    FROM agg
"""
QUERIES["power_analysis"] = q_power_analysis


def q_suggest_coverage(spark, sf):
    """Suggestion-coverage operations metric for the flagship
    autocomplete: how many prefixes can serve a FULL top-3, how many
    are thin (1-2 candidates), and the candidate-count distribution —
    the serving-quality dashboard row that tells you whether the corpus
    supports the product surface. One extra aggregation over the dq28
    frequency relation."""
    d = _t(spark, sf, "documents")
    q = normalize_queries(d, text_col="text")
    freq = prefix_frequencies(q, max_len=8)
    per_prefix = freq.groupBy("prefix").agg(
        F.countDistinct("query").alias("n_cands")
    )
    bucket = (
        F.when(F.col("n_cands") >= 3, "full_top3")
        .when(F.col("n_cands") == 2, "two")
        .otherwise("one")
    )
    w = Window.partitionBy()
    return per_prefix.select(bucket.alias("coverage")).groupBy(
        "coverage"
    ).agg(F.count(F.lit(1)).alias("n_prefixes")).select(
        "coverage",
        "n_prefixes",
        round4(
            F.col("n_prefixes") / F.sum("n_prefixes").over(w)
        ).alias("share"),
    )


ORACLES["suggest_coverage"] = f"""
    WITH q AS (
      SELECT substring(lower(trim(text)), 1, 500) AS query
      FROM documents WHERE text IS NOT NULL AND length(trim(text)) >= 2
    ), pairs AS (
      SELECT substring(query, 1, k.k) AS prefix, query
      FROM q CROSS JOIN (VALUES (2),(3),(4),(5),(6),(7),(8)) AS k(k)
      WHERE length(query) >= k.k
    ), per_prefix AS (
      SELECT prefix, COUNT(DISTINCT query) AS n_cands
      FROM pairs GROUP BY prefix
    ), buckets AS (
      SELECT CASE WHEN n_cands >= 3 THEN 'full_top3'
                  WHEN n_cands = 2 THEN 'two'
                  ELSE 'one' END AS coverage
      FROM per_prefix
    )
    SELECT coverage, CAST(COUNT(*) AS BIGINT) AS n_prefixes,
           {R("COUNT(*) * 1.0 / SUM(COUNT(*)) OVER ()")} AS share
    FROM buckets GROUP BY coverage
"""
QUERIES["suggest_coverage"] = q_suggest_coverage


def q_session_dwell(spark, sf):
    """Dwell-time distribution: seconds between consecutive events within
    a user session (30-min gap, the DQ24 sessionization), summarized per
    event-type-of-origin with exact percentiles — the engagement-depth
    readout behind "how long do users sit on X". The lag runs inside the
    (user, session) window; percentiles aggregate the dimension-bounded
    (type, dwell) relation."""
    e = _events(spark, sf).select("user_id", "ts", "event_id", "event_type")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(wu))
    sess = e.withColumn(
        "sid",
        F.sum(
            F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
        ).over(wu.rowsBetween(Window.unboundedPreceding, 0)),
    )
    ws = Window.partitionBy("user_id", "sid").orderBy("ts", "event_id")
    dwell = sess.select(
        "event_type",
        (
            F.unix_timestamp(F.lead("ts").over(ws))
            - F.unix_timestamp("ts")
        ).alias("dwell_s"),
    ).where(F.col("dwell_s").isNotNull())
    return dwell.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_dwells"),
        round4(F.percentile("dwell_s", F.lit(0.5))).alias("p50_s"),
        round4(F.percentile("dwell_s", F.lit(0.9))).alias("p90_s"),
        round4(F.avg("dwell_s")).alias("mean_s"),
    )


ORACLES["session_dwell"] = f"""
    WITH g AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                       - CAST(floor(epoch(LAG(ts) OVER
                           (PARTITION BY user_id ORDER BY ts, event_id)))
                         AS BIGINT) > 1800
                  OR LAG(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_s
      FROM events
    ), s AS (
      SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM g
    ), dwell AS (
      SELECT event_type,
             CAST(floor(epoch(LEAD(ts) OVER (PARTITION BY user_id, sid
                  ORDER BY ts, event_id))) AS BIGINT)
               - CAST(floor(epoch(ts)) AS BIGINT) AS dwell_s
      FROM s
    )
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_dwells,
           {R("quantile_cont(dwell_s, 0.5)")} AS p50_s,
           {R("quantile_cont(dwell_s, 0.9)")} AS p90_s,
           {R("AVG(dwell_s)")} AS mean_s
    FROM dwell WHERE dwell_s IS NOT NULL
    GROUP BY event_type
"""
QUERIES["session_dwell"] = q_session_dwell


def q_error_budget(spark, sf):
    """SLO error-budget burn (the SRE readout): daily error rate vs a
    1.5% objective, the day's budget consumption (rate/SLO), cumulative
    burn over the window, and the day the budget exhausts at the
    current pace — one rollup plus two windows over the daily relation.
    Gates a release freeze the same way production burn alerts do."""
    slo = 0.015
    e = _events(spark, sf)
    daily = e.groupBy(F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(
            F.when(F.col("event_type") == "error", 1).otherwise(0)
        ).cast("double").alias("errs"),
    )
    w_cum = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    rate = F.col("errs") / F.col("n")
    t = daily.select(
        "d",
        "n",
        "errs",
        rate.alias("rate"),
        (
            F.sum("errs").over(w_cum)
            / (F.sum("n").over(w_cum) * F.lit(slo))
        ).alias("cum_burn"),
    )
    return t.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("n").cast("long").alias("n_events"),
        F.col("errs").cast("long").alias("n_errors"),
        round4(F.col("rate")).alias("error_rate"),
        round4(F.col("rate") / F.lit(slo)).alias("daily_burn"),
        round4(F.col("cum_burn")).alias("cumulative_burn"),
    )


ORACLES["error_budget"] = f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                  AS DOUBLE) AS errs
      FROM events GROUP BY 1
    )
    SELECT strftime(d, '%Y-%m-%d') AS day,
           CAST(n AS BIGINT) AS n_events,
           CAST(errs AS BIGINT) AS n_errors,
           {R("errs / n")} AS error_rate,
           {R("errs / n / 0.015")} AS daily_burn,
           {R("SUM(errs) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING "
              "AND CURRENT ROW) / (SUM(n) OVER (ORDER BY d ROWS BETWEEN "
              "UNBOUNDED PRECEDING AND CURRENT ROW) * 0.015)")}
             AS cumulative_burn
    FROM daily
"""
QUERIES["error_budget"] = q_error_budget


def q_keyword_trends(spark, sf):
    """Rising-terms detection between the two halves of the observation
    window (the batch "trending searches" feature, complementing the
    streaming trending job): per term, smoothed frequency ratio
    (f2 + 1)/(f1 + 1) with a support floor, top-15 risers with the
    deterministic md5 tie-break. Two token rollups + one join; the rise
    ratio's +1 smoothing keeps new terms finite and damps noise exactly
    like the bigram-LM smoothing."""
    d = _t(spark, sf, "documents")
    half = F.col("doc_id") % 2  # deterministic halves (no ts on documents)
    toks = d.select(
        half.alias("h"),
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("w"),
    ).where(F.length("w") >= 3)
    counts = toks.groupBy("w").agg(
        F.sum(F.when(F.col("h") == 0, 1).otherwise(0)).cast("double").alias("f1"),
        F.sum(F.when(F.col("h") == 1, 1).otherwise(0)).cast("double").alias("f2"),
    ).where(F.col("f1") + F.col("f2") >= 10)
    from batch_processing_pipeline_spark.operators.rank import global_topk

    rise = (F.col("f2") + 1.0) / (F.col("f1") + 1.0)
    # vocabulary-sized input -> two-phase global top-k (round 9)
    return global_topk(
        counts.select(
            F.col("w").alias("term"),
            F.col("f1").cast("long").alias("n_first_half"),
            F.col("f2").cast("long").alias("n_second_half"),
            round4(rise).alias("rise_ratio"),
        ),
        [F.col("rise_ratio").desc(), F.md5(F.col("term")).asc()],
        k=15,
        rank_col="rk",
    ).select("rk", "term", "n_first_half", "n_second_half", "rise_ratio")


ORACLES["keyword_trends"] = f"""
    WITH toks AS (
      SELECT doc_id % 2 AS h,
             unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w
      FROM documents
    ), counts AS (
      SELECT w,
             CAST(SUM(CASE WHEN h = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS f1,
             CAST(SUM(CASE WHEN h = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS f2
      FROM toks WHERE length(w) >= 3
      GROUP BY w HAVING SUM(1) >= 10
    )
    SELECT rk, term, n_first_half, n_second_half, rise_ratio FROM (
      SELECT w AS term,
             CAST(f1 AS BIGINT) AS n_first_half,
             CAST(f2 AS BIGINT) AS n_second_half,
             {R("(f2 + 1.0) / (f1 + 1.0)")} AS rise_ratio,
             ROW_NUMBER() OVER (ORDER BY {R("(f2 + 1.0) / (f1 + 1.0)")} DESC,
               md5(w) ASC) AS rk
      FROM counts
    ) WHERE rk <= 15
"""
QUERIES["keyword_trends"] = q_keyword_trends


def q_stratified_ate(spark, sf):
    """Stratification-adjusted average treatment effect: users bucket
    into activity quintiles (the observed confounder), and the ATE is
    the stratum-size-weighted difference of treated/control mean
    outcomes — the classic observational adjustment when randomization
    can't be trusted (Cochran's subclassification; five strata remove
    ~90% of the bias a raw difference carries). Per-user rollup, NTILE
    semantics with a total-order tie-break (the qini_uplift lesson) —
    computed since round 9 as arithmetic on an exact range-partitioned
    global rank (operators/rank.py; the user dimension is corpus-scale) —
    one conditional aggregation per stratum, weighted reduce; empty arms
    yield NULL cell means and drop from the weighted sum in both
    engines."""
    e = _events(spark, sf)
    per_user = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("double").alias("activity"),
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("value"))
        ).alias("y"),
    ).select(
        "user_id", "activity", F.coalesce("y", F.lit(0.0)).alias("y")
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("ate:"), F.col("user_id").cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    from batch_processing_pipeline_spark.operators.rank import (
        exact_global_ntile,
    )

    pre = per_user.select(
        "y", "activity", "user_id", (h % 2 == 0).cast("int").alias("t")
    )
    scored = exact_global_ntile(
        pre,
        [F.col("activity").desc(), F.col("user_id").asc()],
        k=5,
        out_col="stratum",
    ).select("y", "t", "stratum")
    per_s = scored.groupBy("stratum").agg(
        F.count(F.lit(1)).cast("double").alias("n_s"),
        F.avg(F.when(F.col("t") == 1, F.col("y"))).alias("yt"),
        F.avg(F.when(F.col("t") == 0, F.col("y"))).alias("yc"),
    )
    w = Window.partitionBy()
    return per_s.select(
        "stratum",
        F.col("n_s").cast("long").alias("n_users"),
        round4(F.col("yt")).alias("mean_treated"),
        round4(F.col("yc")).alias("mean_control"),
        round4(
            F.sum(
                F.when(
                    F.col("yt").isNotNull() & F.col("yc").isNotNull(),
                    F.col("n_s") * (F.col("yt") - F.col("yc")),
                )
            ).over(w)
            / F.sum("n_s").over(w)
        ).alias("stratified_ate"),
    )


ORACLES["stratified_ate"] = f"""
    WITH per_user AS (
      SELECT user_id, CAST(COUNT(*) AS DOUBLE) AS activity,
             COALESCE(SUM(CASE WHEN event_type = 'purchase'
                               THEN value END), 0.0) AS y
      FROM events GROUP BY user_id
    ), scored AS (
      SELECT y,
             CASE WHEN CAST('0x' || substr(md5('ate:' || CAST(user_id AS VARCHAR)),
                    1, 8) AS BIGINT) % 2 = 0 THEN 1 ELSE 0 END AS t,
             NTILE(5) OVER (ORDER BY activity DESC, user_id ASC) AS stratum
      FROM per_user
    ), per_s AS (
      SELECT stratum, CAST(COUNT(*) AS DOUBLE) AS n_s,
             AVG(CASE WHEN t = 1 THEN y END) AS yt,
             AVG(CASE WHEN t = 0 THEN y END) AS yc
      FROM scored GROUP BY stratum
    )
    SELECT stratum,
           CAST(n_s AS BIGINT) AS n_users,
           {R("yt")} AS mean_treated,
           {R("yc")} AS mean_control,
           {R("SUM(CASE WHEN yt IS NOT NULL AND yc IS NOT NULL "
              "THEN n_s * (yt - yc) END) OVER () / SUM(n_s) OVER ()")}
             AS stratified_ate
    FROM per_s
"""
QUERIES["stratified_ate"] = q_stratified_ate


def q_ndcg_eval(spark, sf):
    """NDCG@10 for the flagship suggestion ranking — the one standard
    retrieval metric the eval suite lacked (MRR/hit@k: suggest_mrr;
    churn: suggest_rbo; coverage: suggest_coverage). Graded pseudo-
    relevance 0..3 per (prefix, query) via the portable md5 idiom, so
    both engines judge identically; DCG uses the classic
    (2^rel - 1)/log2(pos + 1) gain over the top-10, IDCG re-sorts the
    SAME retrieved set by grade (the retrieved-list NDCG convention).
    Output: the 20 busiest prefixes (deterministic tie-break) with their
    round4 NDCG — if a ranking change degrades graded ordering quality,
    this moves where MRR (binary judgment) may not."""
    d = _t(spark, sf, "documents")
    queries_df = normalize_queries(d, text_col="text")
    freq = prefix_frequencies(queries_df, max_len=8)
    sugg = top_k_per_group(
        freq,
        group_cols=["prefix"],
        order_by=[F.desc("frequency"), F.asc("query")],
        k=10,
    )
    rel = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("rel:"), F.col("prefix"), F.lit(":"), F.col("query"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 4
    )
    graded = sugg.select("prefix", "rk", rel.alias("rel"))
    gain = (F.pow(F.lit(2.0), F.col("rel").cast("double")) - 1.0)
    ideal_w = Window.partitionBy("prefix").orderBy(
        F.col("rel").desc(), F.col("rk").asc()
    )
    per_item = graded.select(
        "prefix",
        (gain / F.log2(F.col("rk").cast("double") + 1.0)).alias("dg"),
        (gain / F.log2(F.row_number().over(ideal_w).cast("double") + 1.0)).alias("ig"),
    )
    per_prefix = per_item.groupBy("prefix").agg(
        F.sum("dg").alias("dcg"), F.sum("ig").alias("idcg")
    )
    from batch_processing_pipeline_spark.operators.rank import global_topk

    busy = freq.groupBy("prefix").agg(F.sum("frequency").alias("total"))
    # prefix-dimension-sized input -> two-phase global top-k (round 9)
    top_busy = global_topk(
        busy,
        [F.col("total").desc(), F.md5("prefix").asc()],
        k=20,
        rank_col="brk",
    ).select("prefix", "total", "brk")
    return (
        top_busy.join(per_prefix, "prefix")
        .select(
            F.col("brk").alias("rk"),
            "prefix",
            F.col("total").cast("long").alias("total_freq"),
            round4(
                F.when(F.col("idcg") > 0.0, F.col("dcg") / F.col("idcg"))
                .otherwise(F.lit(0.0))
            ).alias("ndcg10"),
        )
        .orderBy("rk")
    )


ORACLES["ndcg_eval"] = f"""
    WITH q AS (
      SELECT substring(lower(trim(text)), 1, 500) AS query
      FROM documents WHERE text IS NOT NULL AND length(trim(text)) >= 2
    ), pairs AS (
      SELECT substring(query, 1, k.k) AS prefix, query
      FROM q CROSS JOIN (VALUES (2),(3),(4),(5),(6),(7),(8)) AS k(k)
      WHERE length(query) >= k.k
    ), freq AS (
      SELECT prefix, query, COUNT(*) AS frequency FROM pairs GROUP BY prefix, query
    ), sugg AS (
      SELECT prefix, query, rk FROM (
        SELECT prefix, query,
               ROW_NUMBER() OVER (PARTITION BY prefix
                                  ORDER BY frequency DESC, query ASC) AS rk
        FROM freq
      ) WHERE rk <= 10
    ), graded AS (
      SELECT prefix, rk,
             CAST('0x' || substr(md5('rel:' || prefix || ':' || query), 1, 8)
                  AS BIGINT) % 4 AS rel
      FROM sugg
    ), per_item AS (
      SELECT prefix,
             (power(2.0, CAST(rel AS DOUBLE)) - 1.0)
               / log2(CAST(rk AS DOUBLE) + 1.0) AS dg,
             (power(2.0, CAST(rel AS DOUBLE)) - 1.0)
               / log2(CAST(ROW_NUMBER() OVER (PARTITION BY prefix
                                              ORDER BY rel DESC, rk ASC)
                           AS DOUBLE) + 1.0) AS ig
      FROM graded
    ), per_prefix AS (
      SELECT prefix, SUM(dg) AS dcg, SUM(ig) AS idcg
      FROM per_item GROUP BY prefix
    ), busy AS (
      SELECT prefix, SUM(frequency) AS total,
             ROW_NUMBER() OVER (ORDER BY SUM(frequency) DESC, md5(prefix) ASC) AS brk
      FROM freq GROUP BY prefix
    )
    SELECT busy.brk AS rk, busy.prefix,
           CAST(busy.total AS BIGINT) AS total_freq,
           {R("CASE WHEN per_prefix.idcg > 0.0 "
              "THEN per_prefix.dcg / per_prefix.idcg ELSE 0.0 END")} AS ndcg10
    FROM busy JOIN per_prefix ON busy.prefix = per_prefix.prefix
    WHERE busy.brk <= 20
    ORDER BY rk
"""
QUERIES["ndcg_eval"] = q_ndcg_eval


def q_bayes_smooth_rank(spark, sf):
    """Bayesian-smoothed ranking (the IMDB weighted-rating formula):
    per-part mean quantity shrunk toward the global mean with prior
    weight C=25 — smoothed = (C*m + sum x)/(C + n) — so sparsely-observed
    parts cannot top the ranking on noise. The cold-start discipline any
    popularity/suggestion ranker needs. All sums are integer-valued
    doubles (quantities are whole numbers), so both engines compute the
    identical smoothed score regardless of partial-aggregation order;
    the ranking carries the unique part-key tie-break."""
    li = _t(spark, sf, "lineitem").select("l_partkey", "l_quantity")
    g = li.agg(
        (F.sum("l_quantity") / F.count(F.lit(1))).alias("m")
    )
    per_part = li.groupBy("l_partkey").agg(
        F.sum("l_quantity").alias("sx"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    from batch_processing_pipeline_spark.operators.rank import global_topk

    c = 25.0
    smoothed = (F.lit(c) * F.col("m") + F.col("sx")) / (F.lit(c) + F.col("n"))
    # part-dimension-sized input -> two-phase global top-k (round 9)
    return global_topk(
        per_part.crossJoin(F.broadcast(g)).select(
            F.col("l_partkey").cast("long").alias("part"),
            F.col("n").alias("n_lineitems"),
            round4(F.col("sx") / F.col("n")).alias("raw_mean"),
            round4(smoothed).alias("smoothed_mean"),
        ),
        [F.col("smoothed_mean").desc(), F.col("part").asc()],
        k=20,
        rank_col="rk",
    ).select("rk", "part", "n_lineitems", "raw_mean", "smoothed_mean")


ORACLES["bayes_smooth_rank"] = f"""
    WITH g AS (
      SELECT SUM(l_quantity) / COUNT(*) AS m FROM lineitem
    ), per_part AS (
      SELECT l_partkey, SUM(l_quantity) AS sx, COUNT(*) AS n
      FROM lineitem GROUP BY l_partkey
    ), scored AS (
      SELECT l_partkey, n,
             {R("sx / n")} AS raw_mean,
             {R("(25.0 * g.m + sx) / (25.0 + n)")} AS smoothed_mean
      FROM per_part CROSS JOIN g
    )
    SELECT rk, part, n_lineitems, raw_mean, smoothed_mean FROM (
      SELECT CAST(l_partkey AS BIGINT) AS part,
             CAST(n AS BIGINT) AS n_lineitems,
             raw_mean, smoothed_mean,
             ROW_NUMBER() OVER (ORDER BY smoothed_mean DESC, l_partkey ASC) AS rk
      FROM scored
    ) WHERE rk <= 20
    ORDER BY rk
"""
QUERIES["bayes_smooth_rank"] = q_bayes_smooth_rank


def q_incremental_dedup(spark, sf):
    """Incremental corpus-refresh dedup — the production shape none of
    the within-corpus dedup ops cover: a NEW crawl batch is deduped
    against an EXISTING snapshot's digest index, then within itself.
    At 100 TB the snapshot's text is never rescanned — only its 16-byte
    digest relation (the persisted dedup index every production corpus
    maintains) is read, the new batch LEFT ANTI-joins it, and the
    within-batch pass keeps min doc_id per digest. Accounting output in
    the funnel discipline: one row per stage, so batch-over-batch
    dedup-rate drift is a first-class readout."""
    d = _t(spark, sf, "documents")
    fp = F.md5(F.lower(F.trim(F.col("text"))))
    snap_idx = (
        d.where(F.col("doc_id") % 3 != 0).select(fp.alias("fp")).distinct()
    )
    new_fp = (
        d.where(F.col("doc_id") % 3 == 0).select("doc_id", fp.alias("fp"))
    )
    vs_snap = new_fp.join(snap_idx, "fp", "left_anti")
    kept = vs_snap.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))

    def stage(idx, name, df):
        return df.agg(
            F.lit(idx).cast("int").alias("stage_idx"),
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
        )

    return (
        stage(0, "new_batch", new_fp)
        .unionByName(stage(1, "after_snapshot_filter", vs_snap))
        .unionByName(stage(2, "after_within_batch", kept))
    )


ORACLES["incremental_dedup"] = """
    WITH snap_idx AS (
      SELECT DISTINCT md5(lower(trim(text))) AS fp
      FROM documents WHERE doc_id % 3 <> 0
    ), new_fp AS (
      SELECT doc_id, md5(lower(trim(text))) AS fp
      FROM documents WHERE doc_id % 3 = 0
    ), vs_snap AS (
      SELECT * FROM new_fp
      WHERE fp NOT IN (SELECT fp FROM snap_idx)
    ), kept AS (
      SELECT fp, MIN(doc_id) AS doc_id FROM vs_snap GROUP BY fp
    )
    SELECT CAST(0 AS INTEGER) AS stage_idx, 'new_batch' AS stage,
           CAST(COUNT(*) AS BIGINT) AS n_docs FROM new_fp
    UNION ALL SELECT 1, 'after_snapshot_filter', COUNT(*) FROM vs_snap
    UNION ALL SELECT 2, 'after_within_batch', COUNT(*) FROM kept
"""
QUERIES["incremental_dedup"] = q_incremental_dedup


def q_incremental_dedup_near(spark, sf):
    """NEAR-dup incremental corpus refresh (operators/dedup.py
    neardedup_against_index): the MinHash twin of ``incremental_dedup``.
    The snapshot (doc_id % 3 != 0) persists only its LSH band index; the
    new batch (doc_id % 3 == 0) probes it band-by-band, surviving
    candidates are verified by EXACT Jaccard over candidate ids only
    (semi-join first — snapshot text I/O bounded by candidates, not the
    corpus), then the batch near-dedups within itself. Funnel accounting
    output. Rows-only by declared design (LSH banding is hash-dependent:
    candidate recall < 1 in general, so no SQL oracle can reproduce the
    counts); the planted cross-snapshot behavior is pinned in
    tests/test_dedup.py.

    Bench note: a real refresh amortizes the snapshot band index (it is
    PERSISTED, written once per snapshot) — this query rebuilds it
    in-query because the fixture ships no stored index, so roughly a
    third of the bench row is index-build cost a production run never
    pays per batch.
    """
    from batch_processing_pipeline_spark.operators.dedup import (
        minhash_band_index,
        neardedup_against_index,
    )

    d = _t(spark, sf, "documents")
    snap = d.where(F.col("doc_id") % 3 != 0).select("doc_id", "text")
    batch = d.where(F.col("doc_id") % 3 == 0).select("doc_id", "text")
    index = minhash_band_index(snap)
    _kept, acct = neardedup_against_index(
        batch, index, snapshot=snap, threshold=0.8
    )
    return acct


ORACLES["incremental_dedup_near"] = None
QUERIES["incremental_dedup_near"] = q_incremental_dedup_near


def q_preference_winrate(spark, sf):
    """Pairwise-preference aggregation — the statistic a preference-data
    (RLHF/DPO) pipeline reads before training: consecutive events per
    user form comparison pairs (earlier vs next, deterministic order
    (ts, event_id)); the higher ``value`` wins, ties to the earlier
    event; per unordered type pair report comparisons, wins for the
    lexicographically-first type, its Laplace-smoothed win-rate
    ((w+1)/(n+2)) and log-odds (the one-step Bradley-Terry strength
    readout). Scale shape: one LEAD window per user partition (no
    self-join — pairing is a window, candidate space O(events)), then a
    25-key-bounded aggregation.
    """
    e = _events(spark, sf)
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    seq = e.select(
        "user_id",
        "event_type",
        "value",
        F.lead("event_type").over(w).alias("b_type"),
        F.lead("value").over(w).alias("b_value"),
    ).where(F.col("b_type").isNotNull() & (F.col("event_type") != F.col("b_type")))
    type_a = F.least("event_type", "b_type")
    type_b = F.greatest("event_type", "b_type")
    # the EARLIER event wins ties
    winner = F.when(F.col("value") >= F.col("b_value"), F.col("event_type")).otherwise(
        F.col("b_type")
    )
    pairs = seq.select(
        type_a.alias("type_a"),
        type_b.alias("type_b"),
        F.when(winner == type_a, 1).otherwise(0).alias("win_a"),
    )
    agg = pairs.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).alias("n_comparisons"),
        F.sum("win_a").cast("long").alias("wins_a"),
    )
    wr = (F.col("wins_a").cast("double") + 1.0) / (
        F.col("n_comparisons").cast("double") + 2.0
    )
    return agg.select(
        "type_a",
        "type_b",
        "n_comparisons",
        "wins_a",
        round4(wr).alias("winrate_a"),
        round4(F.log(wr / (1.0 - wr))).alias("logodds_a"),
    )


ORACLES["preference_winrate"] = f"""
    WITH seq AS (
      SELECT user_id, event_type, value,
             LEAD(event_type) OVER w AS b_type,
             LEAD(value) OVER w AS b_value
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), pairs AS (
      SELECT CASE WHEN event_type < b_type THEN event_type ELSE b_type END AS type_a,
             CASE WHEN event_type < b_type THEN b_type ELSE event_type END AS type_b,
             CASE WHEN (CASE WHEN value >= b_value THEN event_type ELSE b_type END)
                       = (CASE WHEN event_type < b_type THEN event_type ELSE b_type END)
                  THEN 1 ELSE 0 END AS win_a
      FROM seq
      WHERE b_type IS NOT NULL AND event_type <> b_type
    ), agg AS (
      SELECT type_a, type_b,
             COUNT(*) AS n_comparisons,
             CAST(SUM(win_a) AS BIGINT) AS wins_a
      FROM pairs GROUP BY type_a, type_b
    )
    SELECT type_a, type_b, n_comparisons, wins_a,
           {R("(CAST(wins_a AS DOUBLE) + 1.0) / (CAST(n_comparisons AS DOUBLE) + 2.0)")}
             AS winrate_a,
           {R("ln(((CAST(wins_a AS DOUBLE) + 1.0) / (CAST(n_comparisons AS DOUBLE) + 2.0)) "
              "/ (1.0 - (CAST(wins_a AS DOUBLE) + 1.0) / (CAST(n_comparisons AS DOUBLE) + 2.0)))")}
             AS logodds_a
    FROM agg
"""
QUERIES["preference_winrate"] = q_preference_winrate


def q_pr_auc_eval(spark, sf):
    """Average precision (area under the precision-recall curve by the
    step interpolation) — the imbalanced-retrieval companion to
    ``auc_eval``'s ROC: AP = mean over positives of precision@rank.
    Scores/labels are the auc_eval construction under a fresh salt.

    Scale shape (round-10, uniform rank-family discipline): rank and
    running positive count over the (score desc, event_id asc) total
    order both come from ONE ``exact_global_cumagg`` call (rk = running
    SUM of a literal 1 rides the same range shuffle as cum_pos — integer
    sums, exact), so even though this eval cohort is bounded
    (user_id < 50, ~3.3k rows flat across SFs) the plan carries no
    partition-less per-row window — same conversion ``auc_eval`` got in
    round 9."""
    e = _events(spark, sf).where(F.col("user_id") < 50)
    label = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("prauc:"), F.col("event_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(4294967296.0)
    )
    raw = F.when(label == 1, 0.3 + 0.7 * u).otherwise(0.7 * u)
    from batch_processing_pipeline_spark.operators.rank import (
        exact_global_cumagg,
    )

    scored = e.select(
        F.col("event_id"), raw.alias("s"), label.alias("y")
    ).withColumn("__one", F.lit(1).cast("long"))
    ranked = exact_global_cumagg(
        scored,
        [F.col("s").desc(), F.col("event_id").asc()],
        [("rk", "__one", "sum"), ("cum_pos", "y", "sum")],
    )
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n_eval"),
        F.sum("y").cast("long").alias("n_pos"),
        F.sum(
            F.when(
                F.col("y") == 1,
                F.col("cum_pos").cast("double") / F.col("rk").cast("double"),
            ).otherwise(0.0)
        ).alias("sum_prec"),
    )
    return agg.select(
        "n_eval",
        "n_pos",
        round4(F.col("sum_prec") / F.col("n_pos").cast("double")).alias(
            "average_precision"
        ),
    )


ORACLES["pr_auc_eval"] = f"""
    WITH scored AS (
      SELECT event_id,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
             CASE WHEN event_type = 'purchase'
                  THEN 0.3 + 0.7 * u ELSE 0.7 * u END AS s
      FROM (
        SELECT event_id, event_type,
               CAST(CAST('0x' || substr(md5('prauc:' || CAST(event_id AS VARCHAR)),
                    1, 8) AS BIGINT) AS DOUBLE) / 4294967296.0 AS u
        FROM events WHERE user_id < 50
      )
    ), ranked AS (
      SELECT y,
             ROW_NUMBER() OVER (ORDER BY s DESC, event_id ASC) AS rk,
             SUM(y) OVER (ORDER BY s DESC, event_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_pos
      FROM scored
    ), agg AS (
      SELECT COUNT(*) AS n_eval,
             CAST(SUM(y) AS BIGINT) AS n_pos,
             SUM(CASE WHEN y = 1
                 THEN CAST(cum_pos AS DOUBLE) / CAST(rk AS DOUBLE)
                 ELSE 0.0 END) AS sum_prec
      FROM ranked
    )
    SELECT n_eval, n_pos,
           {R("sum_prec / CAST(n_pos AS DOUBLE)")} AS average_precision
    FROM agg
"""
QUERIES["pr_auc_eval"] = q_pr_auc_eval


def q_annotator_kappa(spark, sf):
    """Cohen's kappa — inter-annotator agreement, the quality gate every
    labeling pipeline runs before trusting labels: two deterministic
    'annotators' flag documents (A: >= 200 chars; B: >= 30 whitespace
    tokens — correlated length-driven heuristics, the realistic case),
    kappa = (po - pe) / (1 - pe) with pe from the marginals. Pure
    aggregation — one pass, scalar output."""
    d = _t(spark, sf, "documents")
    a1 = F.when(F.length("text") >= 200, 1).otherwise(0)
    a2 = F.when(
        F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+")) >= 30, 1
    ).otherwise(0)
    flags = d.select(a1.alias("a1"), a2.alias("a2"))
    agg = flags.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.when(F.col("a1") == F.col("a2"), 1.0).otherwise(0.0)).alias("po"),
        F.avg(F.col("a1").cast("double")).alias("p1"),
        F.avg(F.col("a2").cast("double")).alias("p2"),
    )
    pe = F.col("p1") * F.col("p2") + (1.0 - F.col("p1")) * (1.0 - F.col("p2"))
    return agg.select(
        "n_docs",
        round4(F.col("po")).alias("po"),
        round4(pe).alias("pe"),
        round4((F.col("po") - pe) / (1.0 - pe)).alias("kappa"),
    )


ORACLES["annotator_kappa"] = f"""
    WITH flags AS (
      SELECT CASE WHEN length(text) >= 200 THEN 1 ELSE 0 END AS a1,
             CASE WHEN len(regexp_split_to_array(lower(trim(text)), '\\s+')) >= 30
                  THEN 1 ELSE 0 END AS a2
      FROM documents
    ), agg AS (
      SELECT COUNT(*) AS n_docs,
             AVG(CASE WHEN a1 = a2 THEN 1.0 ELSE 0.0 END) AS po,
             AVG(CAST(a1 AS DOUBLE)) AS p1,
             AVG(CAST(a2 AS DOUBLE)) AS p2
      FROM flags
    )
    SELECT n_docs,
           {R("po")} AS po,
           {R("p1 * p2 + (1.0 - p1) * (1.0 - p2)")} AS pe,
           {R("(po - (p1 * p2 + (1.0 - p1) * (1.0 - p2))) / "
              "(1.0 - (p1 * p2 + (1.0 - p1) * (1.0 - p2)))")} AS kappa
    FROM agg
"""
QUERIES["annotator_kappa"] = q_annotator_kappa


def q_curriculum_order(spark, sf):
    """Curriculum schedule — the document ORDERING a staged pretraining
    run consumes: difficulty-rank documents (n_chars proxy, doc_id
    tie-break), cut into 4 difficulty strata (NTILE over the total
    order), then interleave the strata round-robin so every training
    window sees the full difficulty mix while within-stratum order stays
    easy-to-hard. Output (doc_id, stratum, position) — a deterministic
    permutation.

    Scale shape (round-9 fix, the docstring's old promise implemented):
    the total order is materialized ONCE as an exact range-partitioned
    global rank (``exact_global_rank``: range shuffle + per-partition
    row_number + broadcast partition offsets — the global_shuffle
    discipline), then BOTH the NTILE stratum and the within-stratum row
    number are pure arithmetic on that rank (``ntile_from_rank`` /
    ``rows_before_ntile_bucket`` + a broadcast scalar count). One corpus
    shuffle total; no partition-less window ever sees a corpus-sized
    input."""
    from batch_processing_pipeline_spark.operators.rank import (
        exact_global_rank,
        ntile_from_rank,
        rows_before_ntile_bucket,
    )

    d = _t(spark, sf, "documents").select("doc_id", "n_chars")
    # total_col: the corpus row count rides the rank helper's P-row
    # counts relation — no second aggregation of documents
    ranked = exact_global_rank(
        d,
        [F.col("n_chars").asc(), F.col("doc_id").asc()],
        out_col="__r",
        total_col="__n",
    )
    stratum = ntile_from_rank(F.col("__r"), F.col("__n"), 4)
    strat = ranked.select("doc_id", F.col("__r"), F.col("__n"), stratum.alias("stratum"))
    rn_in = F.col("__r") - rows_before_ntile_bucket(F.col("stratum"), F.col("__n"), 4)
    return strat.select(
        "doc_id",
        "stratum",
        ((rn_in - 1) * 4 + F.col("stratum")).cast("long").alias("position"),
    )


ORACLES["curriculum_order"] = """
    WITH strat AS (
      SELECT doc_id, n_chars,
             NTILE(4) OVER (ORDER BY n_chars ASC, doc_id ASC) AS stratum
      FROM documents
    )
    SELECT doc_id, stratum,
           CAST((ROW_NUMBER() OVER (PARTITION BY stratum
                   ORDER BY n_chars ASC, doc_id ASC) - 1) * 4 + stratum
                AS BIGINT) AS position
    FROM strat
"""
QUERIES["curriculum_order"] = q_curriculum_order


def q_join_skew_audit(spark, sf):
    """Pre-join skew diagnostic — the report to run BEFORE a self-join
    (sessionization, co-occurrence) decides between plain, salted, or
    broadcast handling: per-key frequency of events.user_id, estimated
    self-join output f², and each hot key's share of the total join
    output, top-10. At 100 TB this is the query whose output chooses the
    skew strategy; it is itself one aggregation + a scalar broadcast
    (the total) + a two-phase top-k."""
    e = _events(spark, sf)
    freq = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("freq"))
    pairs = freq.select(
        "user_id", "freq", (F.col("freq") * F.col("freq")).alias("est_pairs")
    )
    total = pairs.agg(F.sum("est_pairs").alias("tot"))
    ranked = top_k_per_group(
        pairs.crossJoin(F.broadcast(total)),
        [],
        order_by=[F.col("est_pairs").desc(), F.col("user_id").asc()],
        k=10,
    )
    return ranked.select(
        F.col("rk").alias("rank"),
        "user_id",
        "freq",
        "est_pairs",
        round4(F.col("est_pairs").cast("double") / F.col("tot").cast("double")).alias(
            "share"
        ),
    )


ORACLES["join_skew_audit"] = f"""
    WITH freq AS (
      SELECT user_id, COUNT(*) AS freq FROM events GROUP BY user_id
    ), pairs AS (
      SELECT user_id, freq, freq * freq AS est_pairs FROM freq
    ), tot AS (SELECT SUM(est_pairs) AS tot FROM pairs)
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY est_pairs DESC, user_id ASC) AS INTEGER)
             AS rank,
           user_id, freq, est_pairs,
           {R("CAST(est_pairs AS DOUBLE) / CAST(tot AS DOUBLE)")} AS share
    FROM pairs CROSS JOIN tot
    ORDER BY rank LIMIT 10
"""
QUERIES["join_skew_audit"] = q_join_skew_audit


def q_compaction_plan(spark, sf):
    """Small-file compaction PLAN — the declarative half of
    operators/maintenance.compact_files: given a file-metadata relation
    (synthesized here: one 'file' per supplier, size = whole-unit
    quantity mass, exact integer math so both engines agree bit-for-bit),
    greedily pack files in id order into groups of >= 500 units by
    cumulative-sum bucketing (grp = floor(cum_before / target)) and
    report each compaction group's file count and bytes. The window
    cumsum is the whole plan — no per-file loop, so planning 10^7 files
    is one pass; the grouping key then drives the actual rewrite."""
    li = _t(spark, sf, "lineitem")
    files = li.groupBy(F.col("l_suppkey").alias("file_id")).agg(
        F.sum(F.floor("l_quantity").cast("long")).alias("size_units")
    )
    from batch_processing_pipeline_spark.operators.rank import (
        exact_global_cumagg,
    )

    # 10^7-file metadata relations are real at 100 TB: the exclusive
    # cumsum is range-sharded (round 9), never a whole-relation window;
    # integer units keep the re-association exact
    planned = exact_global_cumagg(
        files,
        [F.col("file_id").asc()],
        [("cum_before", "size_units", "sum")],
        inclusive=False,
    ).select(
        "file_id",
        "size_units",
        F.floor(
            F.coalesce(F.col("cum_before"), F.lit(0)) / F.lit(500)
        ).cast("long").alias("grp"),
    )
    return (
        planned.groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("size_units").alias("group_units"),
            F.min("file_id").alias("first_file"),
            F.max("file_id").alias("last_file"),
        )
    )


ORACLES["compaction_plan"] = """
    WITH files AS (
      SELECT l_suppkey AS file_id,
             SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS size_units
      FROM lineitem GROUP BY l_suppkey
    ), planned AS (
      SELECT file_id, size_units,
             CAST(FLOOR(COALESCE(SUM(size_units) OVER (ORDER BY file_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 500.0)
               AS BIGINT) AS grp
      FROM files
    )
    SELECT grp, COUNT(*) AS n_files,
           CAST(SUM(size_units) AS BIGINT) AS group_units,
           MIN(file_id) AS first_file, MAX(file_id) AS last_file
    FROM planned GROUP BY grp
"""
QUERIES["compaction_plan"] = q_compaction_plan


def q_bpe_compression_by_lang(spark, sf):
    """Tokenizer compression audit by language — the fertility readout a
    multilingual pretraining mix is balanced on: encode every document
    with the PINNED merge table (registry.analytics._BPE_PINNED_MERGES,
    the bpe_encode apply pass) and report per-language corpus mass as
    chars, BPE tokens, and chars-per-token. A tokenizer trained on one
    language compresses it better — the per-lang ratio gap IS the UniMax
    / temperature-mix input. Arrow-batched encode + a 5-key aggregation;
    oracle = the same replace-chain twin as bpe_encode."""
    from batch_processing_pipeline_spark.functions.bpe import bpe_encode
    from batch_processing_pipeline_spark.registry.analytics import (
        _BPE_PINNED_MERGES,
    )

    d = _t(spark, sf, "documents")
    enc = bpe_encode(d.select("doc_id", "lang", "text"), _BPE_PINNED_MERGES)
    per_doc = enc.select(
        "lang",
        F.length(F.lower(F.trim(F.col("text")))).cast("long").alias("n_chars_norm"),
        F.size("bpe_tokens").cast("long").alias("n_tokens"),
    )
    agg = per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars_norm").alias("chars"),
        F.sum("n_tokens").alias("tokens"),
    )
    return agg.select(
        "lang",
        "n_docs",
        "chars",
        "tokens",
        round4(F.col("chars").cast("double") / F.col("tokens").cast("double")).alias(
            "chars_per_token"
        ),
    )


from batch_processing_pipeline_spark.registry.analytics import (  # noqa: E402
    _bpe_replace_chain,
)

_BPE_CHAIN = _bpe_replace_chain("w")
ORACLES["bpe_compression_by_lang"] = f"""
    WITH enc AS (
      SELECT lang,
             CAST(length(lower(trim(text))) AS BIGINT) AS n_chars_norm,
             CAST(len(flatten(list_transform(
               COALESCE(list_filter(
                 regexp_split_to_array(lower(trim(text)), '\\s+'),
                 x -> length(x) > 0), []),
               w -> string_split(trim({_BPE_CHAIN}), ' ')))) AS BIGINT) AS n_tokens
      FROM documents
    ), agg AS (
      SELECT lang, COUNT(*) AS n_docs,
             CAST(SUM(n_chars_norm) AS BIGINT) AS chars,
             CAST(SUM(n_tokens) AS BIGINT) AS tokens
      FROM enc GROUP BY lang
    )
    SELECT lang, n_docs, chars, tokens,
           {R("CAST(chars AS DOUBLE) / CAST(tokens AS DOUBLE)")} AS chars_per_token
    FROM agg
"""
QUERIES["bpe_compression_by_lang"] = q_bpe_compression_by_lang


#: build hybrid_rrf_search's two independent rank pins from a 2-thread
#: pool (overlapping their eager checkpoint jobs, guide §2.6). Private
#: escape hatch: False restores the sequential build — same results
#: (proven by A/B), kept for incident triage and the interleaved bench.
_RRF_PARALLEL_PINS = True


def q_hybrid_rrf_search(spark, sf):
    """Hybrid retrieval via reciprocal-rank fusion (RRF, Cormack et al.:
    score = sum 1/(60+rank)) — the standard way production search fuses
    a LEXICAL ranking (BM25 over posting lists) with a SEMANTIC one
    (embedding cosine): rank-space fusion needs no score calibration
    between the two systems. Lexical side = the bm25_search statistic
    (k1=1.2, b=0.75, fixed terms); semantic side = exact cosine vs the
    query embedding (vec_id 0; doc_id = vec_id in the fixture); a doc
    absent from one list contributes only the other term. Both rankings
    round4 before ranking (cross-engine ulp discipline); top-20.

    Scale shape (round-9 fix): the lexical and semantic lists carry their
    EXACT corpus-wide rank into the output, so they use
    ``exact_global_rank`` (range shuffle + broadcast partition offsets —
    operators/rank.py) instead of a partition-less window; the only
    single-reducer sorts left in the plan see P rows (one per shuffle
    partition). The final fused rank is ``global_topk`` — Spark's
    InferWindowGroupLimit does NOT fire on empty-partition-spec windows,
    so the two-phase prune (local sort + keep 20 per partition, then rank
    <= 20*P survivors) is done explicitly. r_lex/r_sem stay LongType
    end-to-end (DuckDB ROW_NUMBER is BIGINT too) — a corpus-scale rank
    cast to int would silently wrap past 2^31."""
    from batch_processing_pipeline_spark.functions.vector import cosine_similarity
    from batch_processing_pipeline_spark.operators.rank import (
        exact_global_rank,
        global_topk,
    )

    k1, b = 1.2, 0.75
    terms = ["data", "query", "user", "system"]
    d = _t(spark, sf, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("w"),
    ).where(F.col("w") != "")
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).cast("double").alias("dl"))
    stats = dl.agg(
        F.avg("dl").alias("avgdl"), F.count(F.lit(1)).cast("double").alias("n")
    )
    tf = (
        toks.where(F.col("w").isin(terms))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    df_t = tf.groupBy("w").agg(F.countDistinct("doc_id").cast("double").alias("df"))
    idf = F.log((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    lex_scored = (
        tf.join(F.broadcast(df_t), "w")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            (
                idf * F.col("tf") * (k1 + 1.0)
                / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
            ).alias("score"),
        )
        .groupBy("doc_id")
        .agg(F.sum("score").alias("score"))
    )
    emb = _t(spark, sf, "embeddings")
    qvec = emb.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_vec")
    )
    sem_scored = (
        emb.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qvec))
        .select(
            F.col("vec_id").alias("doc_id"),
            round4(cosine_similarity(F.col("embedding"), F.col("q_vec"))).alias(
                "cos"
            ),
        )
    )

    # The two rank pins are INDEPENDENT pipelines whose eager range-
    # shuffle checkpoints each execute a job at construction time
    # (operators/rank.py). Building them from a 2-thread pool overlaps
    # those jobs — the lexical side's tail tasks backfill with the
    # cosine side's scan (guide §2.6 "overlap independent jobs"); each
    # branch still pins its OWN boundaries, so per-branch results are
    # byte-identical to the sequential build (asserted by the round-12
    # A/B: exceptAll both ways = 0, oracle hash-green ×3 scales).
    def _lex():
        return exact_global_rank(
            lex_scored.select("doc_id", round4(F.col("score")).alias("__s")),
            [F.col("__s").desc(), F.col("doc_id").asc()],
            out_col="r_lex",
        ).select("doc_id", F.col("r_lex"))

    def _sem():
        return exact_global_rank(
            sem_scored,
            [F.col("cos").desc(), F.col("doc_id").asc()],
            out_col="r_sem",
        ).select("doc_id", F.col("r_sem"))

    if _RRF_PARALLEL_PINS:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as pool:
            f_lex, f_sem = pool.submit(_lex), pool.submit(_sem)
            lex, sem = f_lex.result(), f_sem.result()
    else:  # sequential escape hatch (A/B + incident fallback)
        lex, sem = _lex(), _sem()

    fused = (
        lex.join(sem, "doc_id", "full_outer")
        .select(
            "doc_id",
            "r_lex",
            "r_sem",
            (
                F.coalesce(1.0 / (60.0 + F.col("r_lex").cast("double")), F.lit(0.0))
                + F.coalesce(
                    1.0 / (60.0 + F.col("r_sem").cast("double")), F.lit(0.0)
                )
            ).alias("rrf"),
        )
    )
    top = global_topk(
        fused,
        [round4(F.col("rrf")).desc(), F.col("doc_id").asc()],
        k=20,
        rank_col="rank",
    )
    return top.select(
        "rank", "doc_id", "r_lex", "r_sem", round4(F.col("rrf")).alias("rrf")
    )


ORACLES["hybrid_rrf_search"] = f"""
    WITH toks AS (
      SELECT doc_id, w FROM (
        SELECT doc_id,
               unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w
        FROM documents
      ) WHERE w <> ''
    ), dl AS (
      SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS dl FROM toks GROUP BY doc_id
    ), stats AS (
      SELECT AVG(dl) AS avgdl, CAST(COUNT(*) AS DOUBLE) AS n FROM dl
    ), tf AS (
      SELECT doc_id, w, CAST(COUNT(*) AS DOUBLE) AS tf FROM toks
      WHERE w IN ('data', 'query', 'user', 'system')
      GROUP BY doc_id, w
    ), df_t AS (
      SELECT w, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df FROM tf GROUP BY w
    ), lex_scored AS (
      SELECT tf.doc_id,
             SUM(ln((stats.n - df_t.df + 0.5) / (df_t.df + 0.5) + 1.0)
                 * tf.tf * (1.2 + 1.0)
                 / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl)))
               AS score
      FROM tf
      JOIN df_t ON df_t.w = tf.w
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats
      GROUP BY tf.doc_id
    ), lex AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY {R("score")} DESC, doc_id ASC)
               AS r_lex
      FROM lex_scored
    ), sem_scored AS (
      SELECT c.vec_id AS doc_id,
             {R("list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),"
                " CAST(c.embedding AS DOUBLE[]))")} AS cos
      FROM embeddings c JOIN embeddings q ON q.vec_id = 0
      WHERE c.vec_id <> 0
    ), sem AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id ASC) AS r_sem
      FROM sem_scored
    ), fused AS (
      SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
             lex.r_lex, sem.r_sem,
             COALESCE(1.0 / (60.0 + CAST(lex.r_lex AS DOUBLE)), 0.0)
             + COALESCE(1.0 / (60.0 + CAST(sem.r_sem AS DOUBLE)), 0.0) AS rrf
      FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
    )
    SELECT rank, doc_id, r_lex, r_sem, rrf FROM (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY {R("rrf")} DESC, doc_id ASC)
                  AS INTEGER) AS rank,
             doc_id, r_lex, r_sem, {R("rrf")} AS rrf
      FROM fused
    ) WHERE rank <= 20
"""
QUERIES["hybrid_rrf_search"] = q_hybrid_rrf_search


def q_distinct_ngram_ratio(spark, sf):
    """Corpus diversity per source (distinct-n, the Self-BLEU-adjacent
    readout synthetic-data curation gates on): distinct unigrams/total
    unigrams and distinct bigrams/total bigrams per source — template
    or model-generated slop collapses the bigram ratio long before the
    unigram one moves. Bigrams form inside each document via one LEAD
    window over token position (no self-join); everything else is
    aggregation."""
    d = _t(spark, sf, "documents").where(F.length(F.trim(F.col("text"))) > 0)
    toks = d.select(
        "source",
        "doc_id",
        F.posexplode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias(
            "i", "w"
        ),
    ).where(F.col("w") != "")
    w_doc = Window.partitionBy("doc_id").orderBy("i")
    grams = toks.select(
        "source",
        "w",
        F.concat_ws(" ", F.col("w"), F.lead("w").over(w_doc)).alias("bg"),
        F.lead("w").over(w_doc).alias("nxt"),
    )
    agg = grams.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_uni"),
        F.countDistinct("w").alias("d_uni"),
        F.count("nxt").alias("n_bi"),
        F.countDistinct(F.when(F.col("nxt").isNotNull(), F.col("bg"))).alias(
            "d_bi"
        ),
    )
    return agg.select(
        "source",
        "n_uni",
        "d_uni",
        "n_bi",
        "d_bi",
        round4(F.col("d_uni").cast("double") / F.col("n_uni").cast("double")).alias(
            "uni_ratio"
        ),
        round4(F.col("d_bi").cast("double") / F.col("n_bi").cast("double")).alias(
            "bi_ratio"
        ),
    )


ORACLES["distinct_ngram_ratio"] = f"""
    WITH d AS (
      SELECT source, doc_id,
             string_split_regex(lower(trim(text)), '\\s+') AS t
      FROM documents WHERE length(trim(text)) > 0
    ), toks AS (
      SELECT source, doc_id, t,
             unnest(generate_series(1, len(t))) AS i
      FROM d
    ), grams AS (
      SELECT source, t[i] AS w,
             CASE WHEN i < len(t) THEN t[i] || ' ' || t[i + 1] END AS bg
      FROM toks WHERE t[i] <> ''
    ), agg AS (
      SELECT source,
             COUNT(*) AS n_uni,
             COUNT(DISTINCT w) AS d_uni,
             COUNT(bg) AS n_bi,
             COUNT(DISTINCT bg) AS d_bi
      FROM grams GROUP BY source
    )
    SELECT source, n_uni, d_uni, n_bi, d_bi,
           {R("CAST(d_uni AS DOUBLE) / CAST(n_uni AS DOUBLE)")} AS uni_ratio,
           {R("CAST(d_bi AS DOUBLE) / CAST(n_bi AS DOUBLE)")} AS bi_ratio
    FROM agg
"""
QUERIES["distinct_ngram_ratio"] = q_distinct_ngram_ratio


def q_snapshot_diff(spark, sf):
    """Row-level diff between two table snapshots — the audit every
    data-versioned lake runs after a refresh (what changed, what
    appeared, what vanished): FULL OUTER join on the key, classify
    added / removed / changed / unchanged, report per-class row count,
    key range, and net value drift. Snapshots are synthesized
    deterministically from orders (old = keys % 7 != 0; new = keys
    % 5 != 0 with a 10% price bump on keys % 3 == 0). One join, one
    aggregation — at 100 TB both sides bucket by the key and the join
    is co-located."""
    o = _t(spark, sf, "orders").select(
        "o_orderkey", F.col("o_totalprice").cast("double").alias("price")
    )
    old = o.where(F.col("o_orderkey") % 7 != 0).select(
        F.col("o_orderkey").alias("key"), F.col("price").alias("old_price")
    )
    new = o.where(F.col("o_orderkey") % 5 != 0).select(
        F.col("o_orderkey").alias("key"),
        F.when(
            F.col("o_orderkey") % 3 == 0, F.col("price") * 1.1
        ).otherwise(F.col("price")).alias("new_price"),
    )
    joined = old.join(new, "key", "full_outer")
    status = (
        F.when(F.col("old_price").isNull(), F.lit("added"))
        .when(F.col("new_price").isNull(), F.lit("removed"))
        .when(F.col("old_price") != F.col("new_price"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    diff = joined.select(
        "key",
        status.alias("status"),
        (F.coalesce("new_price", F.lit(0.0)) - F.coalesce("old_price", F.lit(0.0))).alias(
            "drift"
        ),
    )
    return diff.groupBy("status").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("key").alias("min_key"),
        F.max("key").alias("max_key"),
        round4(F.sum("drift")).alias("net_drift"),
    )


ORACLES["snapshot_diff"] = f"""
    WITH o AS (
      SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS price FROM orders
    ), old AS (
      SELECT o_orderkey AS key, price AS old_price FROM o WHERE o_orderkey % 7 <> 0
    ), new AS (
      SELECT o_orderkey AS key,
             CASE WHEN o_orderkey % 3 = 0 THEN price * 1.1 ELSE price END AS new_price
      FROM o WHERE o_orderkey % 5 <> 0
    ), joined AS (
      SELECT COALESCE(old.key, new.key) AS key, old_price, new_price
      FROM old FULL OUTER JOIN new ON old.key = new.key
    ), diff AS (
      SELECT key,
             CASE WHEN old_price IS NULL THEN 'added'
                  WHEN new_price IS NULL THEN 'removed'
                  WHEN old_price <> new_price THEN 'changed'
                  ELSE 'unchanged' END AS status,
             COALESCE(new_price, 0.0) - COALESCE(old_price, 0.0) AS drift
      FROM joined
    )
    SELECT status, COUNT(*) AS n, MIN(key) AS min_key, MAX(key) AS max_key,
           {R("SUM(drift)")} AS net_drift
    FROM diff GROUP BY status
"""
QUERIES["snapshot_diff"] = q_snapshot_diff


def q_weighted_sample(spark, sf):
    """Weighted sampling WITHOUT replacement (Efraimidis & Spirakis 2006,
    A-RES): each doc draws a deterministic md5-uniform u and competes on
    key = ln(u) / weight (weight = n_chars, clamped >= 1); the k largest
    keys ARE an exact weighted sample without replacement — the standard
    way a training-data mix oversamples long/high-quality documents
    without a global RNG. Deterministic (seeded by doc_id, no RNG state,
    identical under retries/repartitioning — the sampling.py discipline)
    and ORACLE-CHECKABLE because both engines compute the same md5
    arithmetic. Keys round4 before ranking with an md5 tie-break
    (cross-engine ulp discipline on ln/division); top-50 selected by the
    two-phase global_topk — corpus-sized input, never an unpartitioned
    window (operators/rank.py)."""
    from batch_processing_pipeline_spark.operators.rank import global_topk

    d = _t(spark, sf, "documents")
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("ws:"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        + 0.5
    ) / F.lit(4294967296.0)
    wt = F.greatest(F.col("n_chars").cast("double"), F.lit(1.0))
    scored = d.select(
        "doc_id",
        F.col("n_chars").alias("weight"),
        round4(F.log(u) / wt).alias("key"),
    )
    return global_topk(
        scored,
        [
            F.col("key").desc(),
            F.md5(F.col("doc_id").cast("string")).asc(),
        ],
        k=50,
        rank_col="rank",
    ).select("rank", "doc_id", "weight", "key")


ORACLES["weighted_sample"] = f"""
    WITH scored AS (
      SELECT doc_id, n_chars AS weight,
             {R("ln((CAST(CAST('0x' || substr(md5('ws:' || CAST(doc_id AS VARCHAR)), 1, 8)"
                " AS BIGINT) AS DOUBLE) + 0.5) / 4294967296.0)"
                " / GREATEST(CAST(n_chars AS DOUBLE), 1.0)")} AS key
      FROM documents
    )
    SELECT rank, doc_id, weight, key FROM (
      SELECT CAST(ROW_NUMBER() OVER (
               ORDER BY key DESC, md5(CAST(doc_id AS VARCHAR)) ASC)
             AS INTEGER) AS rank,
             doc_id, weight, key
      FROM scored
    ) WHERE rank <= 50
"""
QUERIES["weighted_sample"] = q_weighted_sample


def q_weighted_sample_per_group(spark, sf):
    """Per-stratum weighted sampling without replacement
    (operators/sampling.py weighted_sample_per_group): within each
    language, the 10 documents with the largest A-RES keys
    (key = ln(u)/weight, weight = n_chars clamped >= 1, u the
    deterministic md5-uniform under seed 'wspg') — the per-language
    training-mix primitive completing ``weighted_sample``'s global form;
    quotas would come from ``unimax_alloc``/Neyman in production (that
    composition is pinned in tests/test_sampling.py — a constant quota
    keeps this entry oracle-exact). Keys round4 before ranking with an
    md5 tie-break (cross-engine ulp discipline); the constant quota
    plans the two-phase WindowGroupLimit, so a Zipf-dominant language
    ships 10 rows per map task, never its full stratum."""
    from batch_processing_pipeline_spark.operators.sampling import (
        weighted_sample_per_group,
    )

    d = _t(spark, sf, "documents").select(
        "lang", "doc_id", F.col("n_chars").alias("weight")
    )
    return weighted_sample_per_group(
        d,
        ["lang"],
        weight_col="weight",
        n=10,
        key_col="doc_id",
        seed="wspg",
        key_transform=round4,
    ).select("lang", "rank", "doc_id", "weight", F.col("key"))


ORACLES["weighted_sample_per_group"] = f"""
    WITH scored AS (
      SELECT lang, doc_id, n_chars AS weight,
             {R("ln((CAST(CAST('0x' || substr(md5('wspg:' || CAST(doc_id AS VARCHAR)), 1, 8)"
                " AS BIGINT) AS DOUBLE) + 0.5) / 4294967296.0)"
                " / GREATEST(CAST(n_chars AS DOUBLE), 1.0)")} AS key
      FROM documents
    )
    SELECT lang, rank, doc_id, weight, key FROM (
      SELECT lang, doc_id, weight, key,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY key DESC, md5(CAST(doc_id AS VARCHAR)) ASC)
             AS INTEGER) AS rank
      FROM scored
    ) WHERE rank <= 10
"""
QUERIES["weighted_sample_per_group"] = q_weighted_sample_per_group


def q_weighted_mix_sample(spark, sf):
    """The training-mix composition end-to-end, fully oracle-checked:
    UniMax capped water-filling (the ``unimax_alloc`` solve — c=4 epochs,
    budget 2x corpus) turns per-language token counts into a token
    allocation; the allocation becomes a per-language DOCUMENT quota
    (n_docs x alloc/cap, round4 before ceil so the boundary is
    engine-portable, capped at the stratum size); the quota drives
    per-language A-RES weighted sampling without replacement
    (``weighted_sample_per_group`` with the quota RELATION — the exact
    production wiring the operator exists for). Capped (tail) languages
    keep all docs; head languages are weight-sampled down — one query
    demonstrating alloc -> quota -> sample with a DuckDB twin of every
    stage."""
    from batch_processing_pipeline_spark.functions.text_analysis import (
        whitespace_token_count,
    )
    from batch_processing_pipeline_spark.operators.sampling import (
        weighted_sample_per_group,
    )

    c_epochs, budget_frac = 4.0, 2.0
    d = _t(spark, sf, "documents").where(F.length(F.trim(F.col("text"))) > 0)
    per_lang = d.groupBy("lang").agg(
        F.sum(whitespace_token_count(F.lower(F.trim(F.col("text")))))
        .cast("double")
        .alias("n_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    w_all = Window.partitionBy()
    order = [(F.col("n_tokens") * c_epochs).asc(), F.col("lang").asc()]
    w_cum = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    ranked = per_lang.select(
        "lang",
        "n_tokens",
        "n_docs",
        (F.col("n_tokens") * F.lit(c_epochs)).alias("cap"),
        F.sum("n_tokens").over(w_all).alias("total"),
        F.count(F.lit(1)).over(w_all).alias("n_langs"),
        F.row_number().over(Window.orderBy(*order)).alias("k"),
        F.sum(F.col("n_tokens") * c_epochs).over(w_cum).alias("prefix"),
    )
    b = F.col("total") * F.lit(budget_frac)
    capped = (
        F.col("cap") * (F.col("n_langs") - F.col("k") + 1)
        <= b - (F.col("prefix") - F.col("cap"))
    ).cast("int")
    flagged = ranked.withColumn("capped", capped)
    solved = flagged.select(
        "lang",
        "n_docs",
        "cap",
        "capped",
        b.alias("budget"),
        F.sum("capped").over(w_all).alias("n_capped"),
        F.sum(F.col("cap") * F.col("capped")).over(w_all).alias("capped_sum"),
        "n_langs",
    )
    alloc = F.when(F.col("capped") == 1, F.col("cap")).otherwise(
        (F.col("budget") - F.col("capped_sum"))
        / (F.col("n_langs") - F.col("n_capped"))
    )
    quotas = solved.select(
        "lang",
        F.least(
            F.col("n_docs"),
            F.ceil(round4(F.col("n_docs") * alloc / F.col("cap"))),
        )
        .cast("int")
        .alias("n"),
    )
    sampled = weighted_sample_per_group(
        d.select("lang", "doc_id", F.col("n_chars").alias("weight")),
        ["lang"],
        weight_col="weight",
        n=quotas,
        key_col="doc_id",
        seed="wms",
        key_transform=round4,
    )
    return sampled.select("lang", "rank", "doc_id", "weight", F.col("key"))


ORACLES["weighted_mix_sample"] = f"""
    WITH per_lang AS (
      SELECT lang,
             CAST(SUM(len(regexp_split_to_array(lower(trim(text)), '\\s+')))
                  AS DOUBLE) AS n_tokens,
             COUNT(*) AS n_docs
      FROM documents WHERE length(trim(text)) > 0
      GROUP BY lang
    ), ranked AS (
      SELECT lang, n_tokens, n_docs, n_tokens * 4.0 AS cap,
             SUM(n_tokens) OVER () AS total,
             COUNT(*) OVER () AS n_langs,
             ROW_NUMBER() OVER (ORDER BY n_tokens * 4.0 ASC, lang ASC) AS k,
             SUM(n_tokens * 4.0) OVER (ORDER BY n_tokens * 4.0 ASC, lang ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prefix
      FROM per_lang
    ), flagged AS (
      SELECT *, total * 2.0 AS budget,
             CASE WHEN cap * (n_langs - k + 1)
                       <= total * 2.0 - (prefix - cap)
                  THEN 1 ELSE 0 END AS capped
      FROM ranked
    ), solved AS (
      SELECT lang, n_docs, cap, capped, budget, n_langs,
             SUM(capped) OVER () AS n_capped,
             SUM(cap * capped) OVER () AS capped_sum
      FROM flagged
    ), quotas AS (
      SELECT lang,
             CAST(LEAST(CAST(n_docs AS BIGINT), CAST(CEIL({R(
                 "n_docs * (CASE WHEN capped = 1 THEN cap ELSE "
                 "(budget - capped_sum) / (n_langs - n_capped) END) / cap"
             )}) AS BIGINT)) AS INTEGER) AS n
      FROM solved
    ), scored AS (
      SELECT lang, doc_id, n_chars AS weight,
             {R("ln((CAST(CAST('0x' || substr(md5('wms:' || CAST(doc_id AS VARCHAR)), 1, 8)"
                " AS BIGINT) AS DOUBLE) + 0.5) / 4294967296.0)"
                " / GREATEST(CAST(n_chars AS DOUBLE), 1.0)")} AS key
      FROM documents WHERE length(trim(text)) > 0
    ), ws AS (
      SELECT lang, doc_id, weight, key,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY key DESC, md5(CAST(doc_id AS VARCHAR)) ASC)
             AS INTEGER) AS rank
      FROM scored
    )
    SELECT ws.lang AS lang, rank, doc_id, weight, key
    FROM ws JOIN quotas q ON q.lang = ws.lang
    WHERE rank <= q.n
"""
QUERIES["weighted_mix_sample"] = q_weighted_mix_sample


def q_exact_quantiles(spark, sf):
    """EXACT global quantiles of a fact-sized column (nearest-rank,
    type-1) without a single-partition sort: the quantile at q is the
    value whose exact global rank is ceil(q*n) under the (value, unique
    id) total order. Ranks come from the range-sharded
    exact_global_rank; the four target ranks are computed from one
    broadcast scalar count and picked by a bounded IN filter — so the
    whole query is one range shuffle + a 4-row semi-filter, where
    percentile_cont/_disc aggregate implementations funnel the sorted
    relation through their aggregation path and approx_percentile trades
    exactness away. Integer comparisons only: no float-order exposure."""
    from batch_processing_pipeline_spark.operators.rank import (
        exact_global_rank,
    )

    li = _t(spark, sf, "lineitem").select(
        F.col("l_quantity").cast("double").alias("v"),
        F.col("l_orderkey"),
        F.col("l_linenumber"),
    )
    ranked = exact_global_rank(
        li,
        [
            F.col("v").asc(),
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
        ],
        out_col="r",
        total_col="__n",
    )
    # the row count rides the rank helper's P-row counts relation —
    # no second scan of the fact table. Each row keeps the q's whose
    # target rank ceil(q*n) IS its own rank (a tiny per-row array
    # filter in codegen; ties on v are impossible to double-count
    # because the rank is total) — multi-match rows fan out one row
    # per matched q, mirroring the oracle's join semantics.
    hits = F.filter(
        F.array(
            *[
                F.struct(
                    F.lit(q).alias("q"),
                    F.ceil(F.lit(q) * F.col("__n")).cast("long").alias("tr"),
                )
                for q in (0.25, 0.5, 0.9, 0.99)
            ]
        ),
        lambda s: s["tr"] == F.col("r"),
    )
    return (
        ranked.select(F.explode(hits).alias("t"), F.col("v"))
        .select(F.col("t.q").alias("q"), round4(F.col("v")).alias("value"))
    )


ORACLES["exact_quantiles"] = f"""
    WITH ranked AS (
      SELECT l_quantity AS v,
             ROW_NUMBER() OVER (
               ORDER BY l_quantity ASC, l_orderkey ASC, l_linenumber ASC
             ) AS r
      FROM lineitem
    ), n AS (SELECT COUNT(*) AS n FROM lineitem),
    targets AS (
      SELECT q, CAST(CEIL(q * n.n) AS BIGINT) AS r
      FROM (VALUES (0.25), (0.5), (0.9), (0.99)) AS t(q) CROSS JOIN n
    )
    SELECT t.q AS q, {R("ranked.v")} AS value
    FROM ranked JOIN targets t USING (r)
"""
QUERIES["exact_quantiles"] = q_exact_quantiles


def q_markov_transitions(spark, sf):
    """First-order Markov transition matrix over each user's event-type
    sequence — counts and row-normalized probabilities of (from -> to)
    steps, the classic behavioral-sequence model (and the stats a
    synthetic-session generator or next-event baseline is fit from).

    Scale shape: the only fact-sized operation is one window shuffle
    partitioned by ``user_id`` (high-cardinality — scales out) computing
    ``lag(event_type)``; the transition counts then fold through a
    map-side-combined hash aggregate whose output is DOMAIN-bounded
    (|event types|² rows), and the row normalization is a window over
    that bounded relation. No fact-sized join, no global ordering.
    """
    e = _events(spark, sf).where(F.col("event_type").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.lag("event_type").over(w).alias("from_type"),
        F.col("event_type").alias("to_type"),
    ).where(F.col("from_type").isNotNull())
    t = seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    wf = Window.partitionBy("from_type")
    return t.select(
        "from_type",
        "to_type",
        "n",
        round4(F.col("n").cast("double") / F.sum("n").over(wf)).alias("p"),
    )


ORACLES["markov_transitions"] = f"""
    WITH seq AS (
      SELECT LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS from_type,
             event_type AS to_type
      FROM events WHERE event_type IS NOT NULL
    ), t AS (
      SELECT from_type, to_type, COUNT(*) AS n
      FROM seq WHERE from_type IS NOT NULL GROUP BY 1, 2
    )
    SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
           {R("CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY from_type)")} AS p
    FROM t
"""
QUERIES["markov_transitions"] = q_markov_transitions


def q_series_autocorr(spark, sf):
    """Autocorrelation function (lags 1..7) of each event type's daily
    count series — the standard seasonality/trend diagnostic before
    fitting any forecaster (a weekly cycle shows as a lag-7 peak).

    Scale shape: the fact-sized work is ONE partially-aggregated
    ``groupBy(event_type, day)`` count; everything after runs on the
    CALENDAR-bounded daily relation (|types| × days rows): the lag
    fan-out is a codegen ``explode`` (no join node), the (series,
    series-shifted) alignment is an equi-join on (type, day-lag) —
    broadcastable at any corpus size because days are bounded by the
    calendar, not the data — and ``corr`` is a single Pearson aggregate
    per (type, lag). The 100-TB cost is the daily count, nothing else.
    """
    e = _events(spark, sf)
    daily = e.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01")).cast("long").alias("d"),
    ).agg(F.count(F.lit(1)).cast("double").alias("x"))
    a = daily.withColumn(
        "lag_k", F.explode(F.array(*[F.lit(i) for i in range(1, 8)]))
    )
    b = daily.select(
        F.col("event_type").alias("bt"),
        F.col("d").alias("bd"),
        F.col("x").alias("bx"),
    )
    pairs = a.join(
        b,
        (F.col("bt") == F.col("event_type"))
        & (F.col("bd") == F.col("d") - F.col("lag_k")),
        "inner",
    )
    return pairs.groupBy("event_type", "lag_k").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        round4(F.corr("x", "bx")).alias("acf"),
    )


ORACLES["series_autocorr"] = f"""
    WITH daily AS (
      SELECT event_type,
             CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS d,
             CAST(COUNT(*) AS DOUBLE) AS x
      FROM events GROUP BY 1, 2
    )
    SELECT a.event_type, l.lag_k,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           {R("corr(a.x, b.x)")} AS acf
    FROM daily a
    CROSS JOIN (VALUES (1),(2),(3),(4),(5),(6),(7)) AS l(lag_k)
    JOIN daily b ON b.event_type = a.event_type AND b.d = a.d - l.lag_k
    GROUP BY 1, 2
"""
QUERIES["series_autocorr"] = q_series_autocorr
