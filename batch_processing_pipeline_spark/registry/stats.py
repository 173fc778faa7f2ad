"""Registry section: statistics surface: nonparametric tests, survival, market-basket, information theory, robust regression.

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
    cosine_topk,
    round4,
)
from batch_processing_pipeline_spark.registry.core import _COS  # noqa: F401
from batch_processing_pipeline_spark.registry.analytics import _SMB_CLEANUP_DIRS  # noqa: F401

# ---------------------------------------------------------- round-4 additions
def q_semdedup(spark, sf):
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication"): cluster the embedding space (one deterministic
    assignment round, init = the 8 lowest vec_ids — the coarse quantizer
    the paper uses k-means for), then WITHIN each cluster mark a vector
    as a semantic duplicate when its cosine to any LOWER-id cluster-mate
    reaches 0.35 (the keep-first greedy sweep; conservatively transitive
    — if a~b and b~c, both b and c drop).

    Scale shape — the paper's core trick, preserved: pairwise cosine runs
    ONLY within clusters, so cost is sum over clusters of |c|² instead of
    n²; at 100 TB you raise k so |c| stays bounded and the per-cluster
    pair join is an equi-join on cluster id. Dots/norms use the bulk
    posexplode + partial-agg form; the one-round ASSIGNMENT deliberately
    uses ivf.assign_cells' fixed-order fold (interpreted HOF — the only
    form whose IEEE addition order the oracle can replicate exactly;
    kmeans_assign makes the same trade) — at corpus scale swap it for
    ivf.assign_cells_bulk and accept ulp-level assignment drift. Cosines
    round4 BEFORE the threshold so partial-sum order cannot flip a
    boundary pair (same contract as decontaminate_embedding).
    """
    from batch_processing_pipeline_spark.operators.ivf import assign_cells

    k = 8
    e = _t(spark, sf, "embeddings").select("vec_id", "embedding")
    init = [
        [float(x) for x in r.embedding]
        for r in e.where(F.col("vec_id") < k).orderBy("vec_id").collect()
    ]
    assigned = assign_cells(e, init, out_col="_cells").select(
        "vec_id", F.element_at("_cells", 1).cast("int").alias("cluster")
    )
    dims = (
        _t(spark, sf, "embeddings")
        .select("vec_id", F.posexplode("embedding").alias("pos", "v"))
        .select("vec_id", "pos", F.col("v").cast("double").alias("v"))
    )
    norms = dims.groupBy("vec_id").agg(
        F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("nrm")
    )
    cd = dims.join(assigned, "vec_id")
    a = cd.select(
        F.col("vec_id").alias("id_a"), "cluster", "pos", F.col("v").alias("va")
    )
    b = cd.select(
        F.col("vec_id").alias("id_b"), "cluster", "pos", F.col("v").alias("vb")
    )
    dots = (
        a.join(b, ["cluster", "pos"])
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("va") * F.col("vb")).alias("dot"))
    )
    sims = (
        dots.join(norms.select(F.col("vec_id").alias("id_a"), F.col("nrm").alias("na")), "id_a")
        .join(norms.select(F.col("vec_id").alias("id_b"), F.col("nrm").alias("nb")), "id_b")
        .select("id_a", "id_b", round4(F.col("dot") / (F.col("na") * F.col("nb"))).alias("sim"))
        .where(F.col("sim") >= 0.35)
    )
    dropped = sims.select(F.col("id_b").alias("vec_id")).distinct()
    return assigned.join(dropped.withColumn("_d", F.lit(1)), "vec_id", "left").select(
        "vec_id", "cluster", F.col("_d").isNull().alias("keep")
    )


def _semdedup_oracle() -> str:
    d2 = " + ".join(
        f"(CAST(a.e[{i}] AS DOUBLE) - c.cent[{i}])"
        f" * (CAST(a.e[{i}] AS DOUBLE) - c.cent[{i}])"
        for i in range(1, 65)
    )
    return f"""
    WITH n AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                   CAST(embedding AS DOUBLE[]))) AS nrm
      FROM embeddings
    ), init AS (
      SELECT vec_id AS cluster, e AS cent FROM n WHERE vec_id < 8
    ), d AS (
      SELECT a.vec_id, c.cluster, {d2} AS dist
      FROM n a CROSS JOIN init c
    ), assigned AS (
      SELECT vec_id, cluster FROM (
        SELECT vec_id, cluster,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY dist ASC, cluster ASC) AS rn
        FROM d
      ) WHERE rn = 1
    ), pairs AS (
      SELECT a2.vec_id AS id_b,
             {R("list_dot_product(na.e, nb.e) / (na.nrm * nb.nrm)")} AS sim
      FROM assigned a1
      JOIN assigned a2 ON a1.cluster = a2.cluster AND a1.vec_id < a2.vec_id
      JOIN n na ON na.vec_id = a1.vec_id
      JOIN n nb ON nb.vec_id = a2.vec_id
    ), dropped AS (
      SELECT DISTINCT id_b FROM pairs WHERE sim >= CAST(0.35 AS DOUBLE)
    )
    SELECT a.vec_id, CAST(a.cluster AS INTEGER) AS cluster,
           d.id_b IS NULL AS keep
    FROM assigned a LEFT JOIN dropped d ON a.vec_id = d.id_b
"""


ORACLES["semdedup"] = _semdedup_oracle()
QUERIES["semdedup"] = q_semdedup


def q_psi_drift(spark, sf):
    """Population Stability Index drift audit per event type: the value
    distribution of the month's SECOND half (current) against its FIRST
    half (baseline), over 10 fixed-width bins (width 50, top bin open) —
    the standard model-monitoring drift score a feature pipeline runs
    before retraining. PSI = Σ (p_cur − p_base)·ln(p_cur/p_base); bins
    are Laplace-smoothed ((n+0.5)/(N+5)) so empty bins stay finite.

    Engine-portability contract: bins are FIXED-width (quantile bins
    would hinge on interpolated cut points — an ulp flips a bin), each
    bin's PSI term is round4'd before the sum, and the reported psi is
    the sum of those rounded terms — bit-stable across engines and
    partitionings. Two partial-agg passes, 100-row result.
    """
    e = _events(spark, sf).select(
        "event_type",
        F.when(F.dayofmonth("ts") < 16, "base").otherwise("cur").alias("period"),
        F.least(F.floor(F.col("value") / 50).cast("int"), F.lit(9)).alias("bin"),
    )
    counts = e.groupBy("event_type", "period", "bin").agg(
        F.count(F.lit(1)).alias("n")
    )
    # dense (type, period, bin) grid so empty bins get the smoothed floor
    types = counts.select("event_type").distinct()
    grid = (
        types.crossJoin(spark.range(10).select(F.col("id").cast("int").alias("bin")))
        .crossJoin(
            spark.createDataFrame([("base",), ("cur",)], "period string")
        )
    )
    full = grid.join(counts, ["event_type", "period", "bin"], "left").select(
        "event_type", "period", "bin", F.coalesce("n", F.lit(0)).alias("n")
    )
    tot = full.groupBy("event_type", "period").agg(F.sum("n").alias("tot"))
    p = full.join(tot, ["event_type", "period"]).select(
        "event_type",
        "period",
        "bin",
        (
            (F.col("n") + F.lit(0.5)) / (F.col("tot") + F.lit(5.0))
        ).alias("p"),
    )
    wide = (
        p.groupBy("event_type", "bin")
        .pivot("period", ["base", "cur"])
        .agg(F.first("p"))
    )
    term = round4(
        (F.col("cur") - F.col("base")) * F.log(F.col("cur") / F.col("base"))
    )
    terms = wide.select("event_type", "bin", term.alias("psi_term"))
    psi = terms.groupBy("event_type").agg(round4(F.sum("psi_term")).alias("psi"))
    return terms.join(psi, "event_type").select(
        "event_type", "bin", "psi_term", "psi"
    )


ORACLES["psi_drift"] = f"""
    WITH e AS (
      SELECT event_type,
             CASE WHEN EXTRACT(day FROM ts) < 16 THEN 'base' ELSE 'cur' END AS period,
             LEAST(CAST(FLOOR(value / 50) AS INTEGER), 9) AS bin
      FROM events
    ), counts AS (
      SELECT event_type, period, bin, COUNT(*) AS n
      FROM e GROUP BY 1, 2, 3
    ), grid AS (
      SELECT t.event_type, pr.period, b.bin
      FROM (SELECT DISTINCT event_type FROM e) t
      CROSS JOIN (SELECT unnest(['base', 'cur']) AS period) pr
      CROSS JOIN (SELECT CAST(unnest(range(0, 10)) AS INTEGER) AS bin) b
    ), filled AS (
      SELECT g.event_type, g.period, g.bin, COALESCE(c.n, 0) AS n
      FROM grid g LEFT JOIN counts c
        ON g.event_type = c.event_type AND g.period = c.period AND g.bin = c.bin
    ), tot AS (
      SELECT event_type, period, SUM(n) AS tot FROM filled GROUP BY 1, 2
    ), p AS (
      SELECT f.event_type, f.period, f.bin,
             (f.n + 0.5) / (t.tot + 5.0) AS p
      FROM filled f JOIN tot t ON f.event_type = t.event_type AND f.period = t.period
    ), wide AS (
      SELECT event_type, bin,
             MAX(CASE WHEN period = 'base' THEN p END) AS base,
             MAX(CASE WHEN period = 'cur' THEN p END) AS cur
      FROM p GROUP BY event_type, bin
    ), terms AS (
      SELECT event_type, bin,
             {R("(cur - base) * ln(cur / base)")} AS psi_term
      FROM wide
    ), psi AS (
      SELECT event_type, {R("SUM(psi_term)")} AS psi FROM terms GROUP BY event_type
    )
    SELECT t.event_type, t.bin, t.psi_term, p.psi
    FROM terms t JOIN psi p ON t.event_type = p.event_type
"""
QUERIES["psi_drift"] = q_psi_drift


def q_embedding_audit(spark, sf):
    """Embedding-space QA audit: per-dimension mean and sample standard
    deviation across the corpus plus each dimension's share of total
    variance — the quick screen for dead dimensions (std ≈ 0), biased
    dimensions (|mean| ≫ 0) and anisotropy (variance mass concentrated in
    few dims) that silently break cosine-based dedup/ANN. One posexplode
    + partial-agg pass; the 64-row result is driver-bounded at any corpus
    size.
    """
    dims = (
        _t(spark, sf, "embeddings")
        .select(F.posexplode("embedding").alias("pos", "v"))
        .select("pos", F.col("v").cast("double").alias("v"))
    )
    stats = dims.groupBy("pos").agg(
        F.avg("v").alias("_mean"),
        F.stddev_samp("v").alias("_std"),
        F.var_samp("v").alias("_var"),
    )
    total_var = stats.agg(F.sum("_var").alias("_tv"))
    return (
        stats.crossJoin(F.broadcast(total_var))
        .select(
            "pos",
            round4(F.col("_mean")).alias("dim_mean"),
            round4(F.col("_std")).alias("dim_std"),
            round4(F.col("_var") / F.col("_tv")).alias("var_share"),
        )
    )


ORACLES["embedding_audit"] = f"""
    WITH dims AS (
      SELECT CAST(p.pos - 1 AS INTEGER) AS pos,
             CAST(e.embedding[p.pos] AS DOUBLE) AS v
      FROM embeddings e
      CROSS JOIN (SELECT unnest(range(1, 65)) AS pos) p
    ), stats AS (
      SELECT pos, AVG(v) AS m, STDDEV_SAMP(v) AS s, VAR_SAMP(v) AS vv
      FROM dims GROUP BY pos
    ), tv AS (SELECT SUM(vv) AS tv FROM stats)
    SELECT pos, {R("m")} AS dim_mean, {R("s")} AS dim_std,
           {R("vv / tv.tv")} AS var_share
    FROM stats CROSS JOIN tv
"""
QUERIES["embedding_audit"] = q_embedding_audit


def q_kcenter_coreset(spark, sf):
    """k-center greedy coreset selection (Sener & Savarese 2018, "Active
    Learning for Convolutional Neural Networks: A Core-Set Approach" —
    the diversity-first data-selection strategy curation pipelines run
    on embeddings): start from the lowest vec_id, then 7 rounds of "add
    the point farthest from its nearest already-selected center".

    Spark shape: the selected set is a driver list (k vectors — bounded
    by construction), each round is ONE distributed job — a
    min-over-selected distance per point (codegen fold over a k-vector
    literal, same pattern as ivf.assign_cells) followed by a max-reduce;
    the corpus never shuffles. Deterministic: distance ties break to the
    lowest vec_id. Rows-only by declared design (an 8-round argmax chain
    has no tractable SQL twin); the greedy invariant — every selected
    point is the true farthest from its predecessors — is pinned in
    tests/test_round4_queries.py.

    Output: (rank, vec_id, dist_to_prev) — dist_to_prev is the point's
    min squared L2 to the set selected before it (0 for the seed).
    """
    k = 8
    e = _t(spark, sf, "embeddings").select("vec_id", "embedding")
    seed = e.orderBy("vec_id").limit(1).collect()[0]
    selected = [(0, int(seed.vec_id), 0.0)]
    centers = [[float(x) for x in seed.embedding]]
    for rank in range(1, k):
        cent = F.lit(centers)
        mind = F.array_min(
            F.transform(
                F.sequence(F.lit(0), F.lit(len(centers) - 1)),
                lambda i: F.aggregate(
                    F.zip_with(
                        F.col("embedding"),
                        F.element_at(cent, (i + F.lit(1)).cast("int")),
                        lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
                    ),
                    F.lit(0.0),
                    lambda a, v: a + v,
                ),
            )
        )
        far = (
            e.where(~F.col("vec_id").isin([s[1] for s in selected]))
            .select("vec_id", "embedding", mind.alias("d"))
            .orderBy(F.desc("d"), F.asc("vec_id"))
            .limit(1)
            .collect()[0]
        )
        selected.append((rank, int(far.vec_id), float(far.d)))
        centers.append([float(x) for x in far.embedding])
    return spark.createDataFrame(
        [(r, v, round(d, 4)) for r, v, d in selected],
        "rank int, vec_id long, dist_to_prev double",
    )


ORACLES["kcenter_coreset"] = None
QUERIES["kcenter_coreset"] = q_kcenter_coreset


def q_dp_counts(spark, sf):
    """Differentially-private release of per-type event counts: seeded
    Laplace(b=2.0) noise via inverse-CDF sampling of a salted-md5
    uniform — the ε=0.5 count release a privacy-aware telemetry pipeline
    publishes. The noise is DETERMINISTIC given the salt (u derives from
    md5('dp:'||event_type), engine-identical), so the oracle pins the
    exact released values; swapping the salt for a secret random seed
    gives the production mechanism unchanged.

    noise = -b·sign(u-0.5)·ln(1-2|u-0.5|), u ∈ (0,1) from the first 8
    hex chars of the salted digest. One partial-agg pass + scalar math.
    """
    b = 2.0
    e = _events(spark, sf).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("true_n")
    )
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("dp:"), F.col("event_type"))), 1, 8),
            16,
            10,
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    centered = u - F.lit(0.5)
    noise = (
        -F.lit(b)
        * F.signum(centered)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(centered))
    )
    return e.select(
        "event_type",
        "true_n",
        round4(noise).alias("noise"),
        round4(F.col("true_n") + noise).alias("released_n"),
    )


ORACLES["dp_counts"] = f"""
    WITH c AS (
      SELECT event_type, COUNT(*) AS true_n FROM events GROUP BY event_type
    ), u AS (
      SELECT event_type, true_n,
             (CAST('0x' || substr(md5('dp:' || event_type), 1, 8) AS UBIGINT)
              + 0.5) / 4294967296.0 AS u
      FROM c
    ), n AS (
      SELECT event_type, true_n,
             -2.0 * sign(u - 0.5) * ln(1.0 - 2.0 * abs(u - 0.5)) AS noise
      FROM u
    )
    SELECT event_type, true_n, {R("noise")} AS noise,
           {R("true_n + noise")} AS released_n
    FROM n
"""
QUERIES["dp_counts"] = q_dp_counts


def q_ab_welch(spark, sf):
    """Welch's two-sample t-test between every event-type pair's value
    distributions — the A/B-test readout an experimentation pipeline
    computes per metric. Per pair: t = (m1-m2)/sqrt(s1²/n1 + s2²/n2),
    Welch–Satterthwaite df. One partial-agg pass produces the 5-row
    (type, n, mean, var) relation; the pair join is 5×5 driver-trivial
    at any corpus size (per-type moments are the only thing that
    shuffles — the 100-TB shape).
    """
    m = _events(spark, sf).groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("value").alias("m"),
        F.var_samp("value").alias("v"),
    )
    a = m.select(
        F.col("event_type").alias("type_a"),
        F.col("n").alias("na"), F.col("m").alias("ma"), F.col("v").alias("va"),
    )
    bdf = m.select(
        F.col("event_type").alias("type_b"),
        F.col("n").alias("nb"), F.col("m").alias("mb"), F.col("v").alias("vb"),
    )
    se2 = F.col("va") / F.col("na") + F.col("vb") / F.col("nb")
    dfree = (se2 * se2) / (
        (F.col("va") / F.col("na")) * (F.col("va") / F.col("na")) / (F.col("na") - 1)
        + (F.col("vb") / F.col("nb")) * (F.col("vb") / F.col("nb")) / (F.col("nb") - 1)
    )
    return (
        a.crossJoin(bdf)
        .where(F.col("type_a") < F.col("type_b"))
        .select(
            "type_a",
            "type_b",
            round4((F.col("ma") - F.col("mb")) / F.sqrt(se2)).alias("t_stat"),
            round4(dfree).alias("df"),
        )
    )


ORACLES["ab_welch"] = f"""
    WITH m AS (
      SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n,
             AVG(value) AS mu, VAR_SAMP(value) AS v
      FROM events GROUP BY event_type
    )
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           {R("(a.mu - b.mu) / sqrt(a.v / a.n + b.v / b.n)")} AS t_stat,
           {R("((a.v / a.n + b.v / b.n) * (a.v / a.n + b.v / b.n)) / "
              "((a.v / a.n) * (a.v / a.n) / (a.n - 1)"
              " + (b.v / b.n) * (b.v / b.n) / (b.n - 1))")} AS df
    FROM m a CROSS JOIN m b
    WHERE a.event_type < b.event_type
"""
QUERIES["ab_welch"] = q_ab_welch


def q_recursive_cte(spark, sf):
    """Recursive CTE (Spark 4.1 `WITH RECURSIVE`) — BFS reachability with
    hop counts over the supplier co-shipment graph (suppliers sharing an
    order), seeded at the minimum suppkey, depth ≤ 3. Each recursion
    level is a DISTINCT frontier join (level size ≤ |suppliers| — the
    working-table semantics both engines share — so UNION ALL recursion
    cannot blow up into path enumeration); min(hops) per node collapses
    the levels. The iterative-graph-traversal surface as a single SQL
    statement — the driver-looped twin is operators/components.py.
    """
    for t in ("lineitem",):
        _t(spark, sf, t).createOrReplaceTempView(t)
    return spark.sql(_RECURSIVE_CTE_SQL)


_RECURSIVE_CTE_SQL = """
    WITH RECURSIVE reach(s, hops) AS (
      SELECT (SELECT MIN(l_suppkey) FROM lineitem) AS s, 0 AS hops
      UNION ALL
      SELECT DISTINCT e.s2 AS s, r.hops + 1 AS hops
      FROM reach r
      JOIN (
        SELECT a.l_suppkey AS s1, b.l_suppkey AS s2
        FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem) a
        JOIN (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem) b
          ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey
      ) e ON e.s1 = r.s
      WHERE r.hops < 3
    )
    SELECT s AS suppkey, CAST(MIN(hops) AS INT) AS min_hops
    FROM reach GROUP BY s
"""

ORACLES["recursive_cte"] = _RECURSIVE_CTE_SQL
QUERIES["recursive_cte"] = q_recursive_cte


def q_session_vars(spark, sf):
    """SQL session variables + EXECUTE IMMEDIATE (Spark 4 scripting
    surface): compute a per-run threshold into a session variable
    (1.5 × avg order total), then run a parameterized statement through
    EXECUTE IMMEDIATE ... USING — the templated-report shape that avoids
    string-splicing values into SQL (injection-safe, plan-cache
    friendly). The oracle inlines the same two-step computation
    statically.
    """
    _t(spark, sf, "orders").createOrReplaceTempView("orders")
    spark.sql(
        "DECLARE OR REPLACE VARIABLE bpps_thresh DOUBLE"
    )
    spark.sql(
        "SET VAR bpps_thresh = (SELECT 1.5 * AVG(o_totalprice) FROM orders)"
    )
    return spark.sql(
        """
        EXECUTE IMMEDIATE
          'SELECT o_orderpriority,
                  CAST(COUNT(*) AS BIGINT) AS n_big,
                  CAST(SUM(CASE WHEN o_orderstatus = ''F'' THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_big_finished
           FROM orders WHERE o_totalprice > ? GROUP BY o_orderpriority'
          USING bpps_thresh
        """
    )


ORACLES["session_vars"] = """
    WITH t AS (SELECT 1.5 * AVG(o_totalprice) AS thresh FROM orders)
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_big,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_big_finished
    FROM orders, t WHERE o_totalprice > t.thresh
    GROUP BY o_orderpriority
"""
QUERIES["session_vars"] = q_session_vars


def q_arrow_grouped(spark, sf):
    """``applyInArrow`` grouped-map surface (Spark 4): per-event-type 10%
    trimmed mean of value — a robust statistic Spark has no native
    aggregate for, computed Arrow-native (zero pandas conversion; the
    group ships as a pyarrow Table). Trim contract, replicated exactly by
    the oracle: sort by (value, event_id), drop floor(n/10) rows from
    each end, average the rest.

    Scale note: like GROUPED_MAP pandas UDFs, each group ships whole to
    one worker — right for bounded per-group payloads (5 types here);
    for billion-row groups reformulate on approx_percentile bounds.
    """
    import pyarrow as pa

    def trimmed(t: "pa.Table") -> "pa.Table":
        import pyarrow.compute as pc

        idx = pc.sort_indices(
            t, sort_keys=[("value", "ascending"), ("event_id", "ascending")]
        )
        vals = pc.take(t.column("value"), idx)
        n = len(vals)
        k = n // 10
        kept = vals.slice(k, n - 2 * k)
        mean = pc.mean(kept).as_py() if len(kept) else None
        return pa.table(
            {
                "event_type": pa.array([t.column("event_type")[0].as_py()]),
                "n_kept": pa.array([len(kept)], pa.int64()),
                "trimmed_mean": pa.array(
                    [None if mean is None else round(mean, 4)], pa.float64()
                ),
            }
        )

    e = _events(spark, sf).select("event_type", "event_id", "value")
    return e.groupBy("event_type").applyInArrow(
        trimmed, "event_type string, n_kept long, trimmed_mean double"
    )


ORACLES["arrow_grouped"] = f"""
    WITH ranked AS (
      SELECT event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           {R("AVG(value)")} AS trimmed_mean
    FROM ranked
    WHERE rn > n // 10 AND rn <= n - n // 10
    GROUP BY event_type
"""
QUERIES["arrow_grouped"] = q_arrow_grouped


def q_xml_funcs(spark, sf):
    """XML ingestion surface (Spark 4 `from_xml` + `xpath_*`): synthesize
    an XML record per order from its columns, then parse it back through
    BOTH the schema'd `from_xml` path and the ad-hoc `xpath` path. The
    oracle computes the expected fields directly from the base columns —
    the synth→parse round trip must be the identity, so any
    escaping/typing/parsing bug breaks the match. (Deterministic synth:
    only well-formed machine-built XML, no entities.)"""
    o = _t(spark, sf, "orders").where(F.col("o_orderkey") < 500)
    xml = F.concat(
        F.lit("<order><k>"), F.col("o_orderkey").cast("string"),
        F.lit("</k><status>"), F.col("o_orderstatus"),
        F.lit("</status><total_cents>"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").cast("string"),
        F.lit("</total_cents></order>"),
    )
    parsed = o.select(
        F.col("o_orderkey"), xml.alias("x")
    ).select(
        "o_orderkey",
        F.from_xml(F.col("x"), "k BIGINT, status STRING, total_cents BIGINT").alias("v"),
        F.expr("xpath_string(x, '/order/status')").alias("xp_status"),
        F.expr("CAST(xpath_long(x, '/order/k') AS BIGINT)").alias("xp_k"),
    )
    return parsed.select(
        "o_orderkey",
        F.col("v.k").alias("k"),
        F.col("v.status").alias("status"),
        F.col("v.total_cents").alias("total_cents"),
        "xp_status",
        "xp_k",
    )


ORACLES["xml_funcs"] = """
    SELECT o_orderkey,
           o_orderkey AS k,
           o_orderstatus AS status,
           CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS total_cents,
           o_orderstatus AS xp_status,
           o_orderkey AS xp_k
    FROM orders WHERE o_orderkey < 500
"""
QUERIES["xml_funcs"] = q_xml_funcs


def q_collation_group(spark, sf):
    """Engine-level collation surface (Spark 4 `COLLATE UNICODE_CI`):
    case-insensitive grouping WITHOUT a lower() rewrite — the collation
    travels with the column, so the optimizer sees the real key. Mixed
    case is planted deterministically (odd doc_ids upper-case their
    source label); the oracle reproduces the semantics with lower()
    (identical for this ASCII domain). Output: case-insensitive source
    groups with counts and the distinct raw spellings seen."""
    d = _t(spark, sf, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 1, F.upper("source"))
        .otherwise(F.col("source"))
        .alias("src_raw"),
    )
    d.createOrReplaceTempView("bpps_collate_docs")
    return spark.sql(
        """
        SELECT CAST(src_raw COLLATE UNICODE_CI AS STRING) AS src_ci,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT src_raw COLLATE UTF8_BINARY) AS BIGINT)
                   AS n_spellings
        FROM bpps_collate_docs
        GROUP BY src_raw COLLATE UNICODE_CI
        """
    ).select(F.lower("src_ci").alias("src_ci"), "n", "n_spellings")


ORACLES["collation_group"] = """
    WITH d AS (
      SELECT doc_id,
             CASE WHEN doc_id % 2 = 1 THEN upper(source) ELSE source END AS src_raw
      FROM documents
    )
    SELECT lower(src_raw) AS src_ci,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT src_raw) AS BIGINT) AS n_spellings
    FROM d GROUP BY lower(src_raw)
"""
QUERIES["collation_group"] = q_collation_group


def q_approx_topk_types(spark, sf):
    """Built-in heavy-hitter sketch (Spark 4.1 `approx_top_k`): top event
    types with counts from ONE sketch aggregate — the engine-native twin
    of the hand-built count-min path (``cms_topk``). Exercised in its
    EXACT regime (k = the full type cardinality, maxItemsTracked ≫
    distinct items), where the sketch's counts are exact and
    oracle-checkable; production uses k ≪ cardinality and accepts the
    sketch bound, same plan shape."""
    _events(spark, sf).select("event_type").createOrReplaceTempView(
        "bpps_atk_events"
    )
    return spark.sql(
        """
        SELECT t.item AS event_type, CAST(t.count AS BIGINT) AS n
        FROM (
          SELECT explode(approx_top_k(event_type, 5, 10000)) AS t
          FROM bpps_atk_events
        )
        """
    )


ORACLES["approx_topk_types"] = """
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
"""
QUERIES["approx_topk_types"] = q_approx_topk_types


def q_sim_topk_filtered(spark, sf):
    """FILTERED vector search — exact cosine top-5 restricted to
    candidates whose joined document has lang='en' — the
    metadata-predicate + ANN combination every production vector store
    exposes. Strategy here is PRE-filter (restrict the corpus, then
    score): the right plan when the predicate is selective, because the
    scan and the scoring both shrink; a POST-filter (score top-k', then
    filter and hope k survive) undercounts when the predicate correlates
    with similarity. The metadata join runs BEFORE scoring — a semi-join
    on the id, so vectors never widen with document columns.
    """
    emb = _t(spark, sf, "embeddings")
    en_docs = (
        _t(spark, sf, "documents")
        .where(F.col("lang") == "en")
        .select(F.col("doc_id").alias("vec_id"))
    )
    corpus = emb.join(en_docs, "vec_id", "left_semi")
    return cosine_topk(emb.where(F.col("vec_id") < 5), corpus, k=5).select(
        "query_id", "rk", "neighbor_id", round4(F.col("cosine")).alias("cosine")
    )


ORACLES["sim_topk_filtered"] = f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {R(_COS)} AS cosine
  FROM embeddings q
  JOIN embeddings c ON q.vec_id <> c.vec_id
  JOIN documents d ON d.doc_id = c.vec_id AND d.lang = 'en'
  WHERE q.vec_id < 5
), ranked AS (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id ASC) AS rk
  FROM scored
)
SELECT query_id, CAST(rk AS INTEGER) AS rk, neighbor_id, cosine
FROM ranked WHERE rk <= 5
"""
QUERIES["sim_topk_filtered"] = q_sim_topk_filtered


def q_continuous_aggregate(spark, sf):
    """Continuous aggregate (the TimescaleDB/hypertable rollup pattern):
    an hourly per-type rollup is MATERIALIZED for the closed past (here:
    days < 25, written to a parquet store and read back — a real
    materialization, not a plan alias) and the open tail (days ≥ 25)
    aggregates on the fly at query time; the serving view is the union.
    The oracle recomputes the whole rollup from raw events, so the
    pinned contract is exactly the one continuous aggregates must hold:
    materialized + fresh-tail == full recompute (no boundary bucket is
    ever split — the refresh watermark lands on a bucket edge).

    Scale shape: the materialized store is refreshed incrementally (the
    merge_aggregates machinery), queries scan rollup rows for history
    and only the tail's raw events — query cost stops growing with
    retained history.
    """
    import atexit
    import hashlib
    import os
    import re
    import shutil

    e = _events(spark, sf).select(
        "event_type",
        F.date_trunc("hour", "ts").alias("hour_bucket"),
        "value",
        F.to_date("ts").alias("_day"),
    )
    cutoff = F.lit("2024-01-25").cast("date")
    # the materialized rollup persists EXACT long cents (r12 sweep):
    # rounded doubles in the store could not merge exactly with the tail
    agg_cols = [
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(cents(F.col("value"))).alias("sv_c"),
    ]
    app = re.sub(r"[^A-Za-z0-9_]", "_", spark.sparkContext.applicationId)
    tag = f"{app}_{hashlib.md5(os.path.abspath(sf).encode()).hexdigest()[:8]}"
    store = f"/tmp/bpps_cagg2/{tag}"  # v2: exact-cents rollup schema
    if store not in _SMB_CLEANUP_DIRS:
        _SMB_CLEANUP_DIRS.add(store)
        atexit.register(shutil.rmtree, store, ignore_errors=True)
    if not os.path.exists(os.path.join(store, "_SUCCESS")):
        (
            e.where(F.col("_day") < cutoff)
            .groupBy("event_type", "hour_bucket")
            .agg(*agg_cols)
            .write.mode("overwrite")
            .parquet(store)
        )
    mat = spark.read.parquet(store)
    tail = (
        e.where(F.col("_day") >= cutoff)
        .groupBy("event_type", "hour_bucket")
        .agg(*agg_cols)
    )
    return mat.unionByName(tail).select(
        "event_type",
        F.col("hour_bucket").cast("timestamp").alias("hour_bucket"),
        "n",
        round4(F.col("sv_c") / F.lit(100.0)).alias("sum_v"),
    )


ORACLES["continuous_aggregate"] = f"""
    SELECT event_type,
           date_trunc('hour', ts) AS hour_bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           {R(sql_sum_money('value'))} AS sum_v
    FROM events
    GROUP BY event_type, date_trunc('hour', ts)
"""
QUERIES["continuous_aggregate"] = q_continuous_aggregate


def q_pretrain_pipeline(spark, sf):
    """The composed LLM pretraining-data curation funnel
    (plans/pretrain.py): quality rules → lang filter → exact dedup →
    exact near-dup dedup (prefix-filtered Jaccard ≥ 0.9, keep-first) →
    benchmark decontamination, with per-stage survivor accounting. The
    oracle re-derives every stage from raw documents, so the whole
    funnel — including the ORDER contract between stages — is
    hash-pinned end to end."""
    from batch_processing_pipeline_spark.plans.pretrain import pretrain_pipeline

    d = _t(spark, sf, "documents").select("doc_id", "text", "lang")
    return pretrain_pipeline(spark, d)


ORACLES["pretrain_pipeline"] = r"""
    WITH corpus AS (
      SELECT doc_id, lower(trim(text)) AS t, lang
      FROM documents WHERE doc_id % 97 <> 0
    ), toks AS (
      SELECT doc_id, t, lang, regexp_split_to_array(t, '\s+') AS tk
      FROM corpus
    ), q AS (
      SELECT doc_id, t, lang FROM toks
      WHERE len(tk) >= 20 AND len(tk) <= 10000
        AND (CAST(list_sum(list_transform(tk, w -> length(w))) AS DOUBLE)
             / CAST(len(tk) AS DOUBLE)) >= 3.0
        AND (CAST(list_sum(list_transform(tk, w -> length(w))) AS DOUBLE)
             / CAST(len(tk) AS DOUBLE)) <= 10.0
        AND len(list_intersect(tk, ['the', 'a', 'of'])) > 0
    ), l AS (
      SELECT doc_id, t FROM q WHERE lang = 'en'
    ), ed AS (
      SELECT doc_id, t FROM l
      WHERE doc_id IN (SELECT MIN(doc_id) FROM l GROUP BY md5(t))
    ), sets AS (
      SELECT doc_id, list_distinct(regexp_split_to_array(t, '\s+')) AS tokens
      FROM ed WHERE length(t) > 0
    ), sized AS (
      SELECT doc_id, tokens, len(tokens) AS n FROM sets WHERE len(tokens) > 0
    ), nd_drop AS (
      SELECT DISTINCT b.doc_id
      FROM sized a JOIN sized b ON a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.tokens, b.tokens)) AS DOUBLE)
            / (a.n + b.n - len(list_intersect(a.tokens, b.tokens))) >= 0.9
    ), nd AS (
      SELECT doc_id, t FROM ed WHERE doc_id NOT IN (SELECT doc_id FROM nd_drop)
    ), bench AS (
      SELECT DISTINCT unnest(list_transform(
               range(1, length(lower(trim(text))) - 22),
               i -> substr(lower(trim(text)), CAST(i AS INTEGER), 24))) AS g
      FROM documents
      WHERE doc_id % 97 = 0 AND length(lower(trim(text))) >= 24
    ), contaminated AS (
      SELECT DISTINCT doc_id FROM (
        SELECT doc_id, unnest(list_transform(
                 range(1, length(t) - 22),
                 i -> substr(t, CAST(i AS INTEGER), 24))) AS g
        FROM nd WHERE length(t) >= 24
      ) WHERE g IN (SELECT g FROM bench)
    ), final AS (
      SELECT doc_id FROM nd
      WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
    )
    SELECT * FROM (
      SELECT 0 AS stage_idx, 'corpus' AS stage,
             CAST((SELECT COUNT(*) FROM corpus) AS BIGINT) AS n_docs
      UNION ALL SELECT 1, 'quality', (SELECT COUNT(*) FROM q)
      UNION ALL SELECT 2, 'lang_en', (SELECT COUNT(*) FROM l)
      UNION ALL SELECT 3, 'exact_dedup', (SELECT COUNT(*) FROM ed)
      UNION ALL SELECT 4, 'near_dedup', (SELECT COUNT(*) FROM nd)
      UNION ALL SELECT 5, 'decontaminated', (SELECT COUNT(*) FROM final)
    )
"""
QUERIES["pretrain_pipeline"] = q_pretrain_pipeline


def q_cdc_apply(spark, sf):
    """CDC changelog APPLY with delete semantics — the Debezium-edge
    operation the reference's MySQL→Kafka→Redis topology performs
    downstream (SURVEY §2.2 CDC fan-out): given an ordered I/U/D change
    stream per key, materialize the current snapshot — a key exists iff
    its LATEST operation is not a delete, with the latest values.

    The changelog derives deterministically from events (op =
    I/U/D by event_id % 5 ∈ {0}/{1,2,3}/{4} — ~20% deletes), versioned by
    the same packed (epoch, event_id) BIGINT as latest_per_key. One
    ``max_by`` hash aggregate (map-side combining, no window sort) +
    a filter on the winning op — the scale-right shape: only one
    candidate row per key per partition ever shuffles.
    """
    e = _events(spark, sf)
    op = (
        F.when(F.col("event_id") % 5 == 0, "I")
        .when(F.col("event_id") % 5 == 4, "D")
        .otherwise("U")
    )
    ver = (
        F.floor(F.unix_timestamp("ts")) * F.lit(10_000_000) + F.col("event_id")
    ).cast("long")
    log = e.select("user_id", op.alias("op"), ver.alias("ver"), "value")
    snap = log.groupBy("user_id").agg(
        F.max("ver").alias("last_ver"),
        F.max_by("op", F.col("ver")).alias("last_op"),
        round4(F.max_by(F.col("value"), F.col("ver"))).alias("last_value"),
        F.sum(F.when(F.col("op") == "D", 1).otherwise(0)).cast("long").alias(
            "n_deletes"
        ),
    )
    return snap.where(F.col("last_op") != "D").select(
        "user_id", "last_ver", "last_value", "n_deletes"
    )


ORACLES["cdc_apply"] = f"""
    WITH log AS (
      SELECT user_id,
             CASE WHEN event_id % 5 = 0 THEN 'I'
                  WHEN event_id % 5 = 4 THEN 'D' ELSE 'U' END AS op,
             CAST(floor(epoch(ts)) AS BIGINT) * 10000000 + event_id AS ver,
             value
      FROM events
    ), snap AS (
      SELECT user_id,
             MAX(ver) AS last_ver,
             arg_max(op, ver) AS last_op,
             {R("arg_max(value, ver)")} AS last_value,
             CAST(SUM(CASE WHEN op = 'D' THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_deletes
      FROM log GROUP BY user_id
    )
    SELECT user_id, last_ver, last_value, n_deletes
    FROM snap WHERE last_op <> 'D'
"""
QUERIES["cdc_apply"] = q_cdc_apply


# --------------------------------------------------------------------------
# Round-4 session-2 additions: sequence + nonparametric-statistics surface.
# Reference parity: the reference's single job (IncrementalAutocomplete.java)
# has no statistics surface; these extend the engine the way its README's
# "analytics on query logs" charter implies — activity streaks, distribution
# drift tests, autocorrelation, corpus-law fits — all as declarative plans.
# --------------------------------------------------------------------------


def q_gap_islands(spark, sf):
    """Gap-and-islands: per-user consecutive-active-day streaks from the
    events log. Classic row_number-difference formulation — day_num minus
    the per-user row_number is constant within one unbroken run, so one
    sort per user key (a single hash-partitioned window, no self-join)
    finds every island. Output: each user's longest streak, its start day,
    and how many distinct streaks they had; ties on length break to the
    earliest start. Scales: all windows are partitioned by user_id."""
    e = _events(spark, sf)
    active = (
        e.select(
            "user_id",
            F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("day_num"),
        )
        .distinct()
    )
    w_user = Window.partitionBy("user_id").orderBy("day_num")
    isl = active.withColumn(
        "grp", F.col("day_num") - F.row_number().over(w_user)
    )
    streaks = isl.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("streak_len"),
        F.min("day_num").alias("start_day"),
    )
    w_cnt = Window.partitionBy("user_id")
    w_best = Window.partitionBy("user_id").orderBy(
        F.col("streak_len").desc(), F.col("start_day").asc()
    )
    return (
        streaks.withColumn("n_streaks", F.count(F.lit(1)).over(w_cnt))
        .withColumn("rn", F.row_number().over(w_best))
        .where(F.col("rn") == 1)
        .select(
            F.col("user_id").cast("long").alias("user_id"),
            F.col("streak_len").cast("long").alias("longest_streak"),
            F.col("start_day").cast("long").alias("start_day"),
            F.col("n_streaks").cast("long").alias("n_streaks"),
        )
    )


ORACLES["gap_islands"] = """
    WITH active AS (
      SELECT DISTINCT user_id,
             CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS day_num
      FROM events
    ), isl AS (
      SELECT user_id, day_num,
             day_num - ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY day_num) AS grp
      FROM active
    ), streaks AS (
      SELECT user_id, grp,
             CAST(COUNT(*) AS BIGINT) AS streak_len,
             MIN(day_num) AS start_day
      FROM isl GROUP BY user_id, grp
    ), best AS (
      SELECT user_id, streak_len, start_day,
             CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_streaks,
             ROW_NUMBER() OVER (
               PARTITION BY user_id
               ORDER BY streak_len DESC, start_day ASC) AS rn
      FROM streaks
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           streak_len AS longest_streak,
           CAST(start_day AS BIGINT) AS start_day,
           n_streaks
    FROM best WHERE rn = 1
"""
QUERIES["gap_islands"] = q_gap_islands


def q_ks_test(spark, sf):
    """Two-sample Kolmogorov-Smirnov statistic between the `value`
    distributions of click vs purchase events. Scale shape: group by the
    VALUE first (the window then runs over distinct values, not rows), so
    the cumulative-ECDF window's input is bounded by value cardinality;
    the two totals ride along as windowed sums instead of a collect.
    D = max |F_a(v) - F_b(v)| over the pooled support.

    NULL values are filtered on both sides (Spark windows sort NULLS
    FIRST ascending, DuckDB NULLS LAST — an unguarded NULL row would
    shift the running ECDF differently per engine), and the final ratio
    is guarded so an empty group yields NULL in both engines instead of
    Spark-NULL-vs-DuckDB-NaN."""
    e = _events(spark, sf).where(
        F.col("event_type").isin("click", "purchase")
        & F.col("value").isNotNull()
    )
    # per_v feeds the range-sharded cumagg's PIN JOB (build time) and the
    # broadcast totals subtree of the final action — two different jobs,
    # so exchange reuse can never deduplicate them and the events scan +
    # groupBy ran twice (round-12 fourth session; the quantile_normalize
    # pattern). The pin job populates this cache; the totals read it.
    # Released by the ContextCleaner when the caller drops the frame.
    per_v = e.groupBy(F.col("value").alias("v")).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("nb"),
    ).persist()
    from batch_processing_pipeline_spark.operators.rank import (
        exact_global_cumagg,
    )

    # distinct-value support can approach corpus size at 100 TB: running
    # ECDFs via the range-sharded cumagg (round 9), totals via a
    # broadcast scalar aggregate — no whole-relation window
    cum = exact_global_cumagg(
        per_v,
        [F.col("v").asc()],
        [("ca", "na", "sum"), ("cb", "nb", "sum")],
    ).crossJoin(
        F.broadcast(
            per_v.agg(F.sum("na").alias("ta"), F.sum("nb").alias("tb"))
        )
    )
    return cum.agg(
        F.max("ta").cast("long").alias("n_click"),
        F.max("tb").cast("long").alias("n_purchase"),
        round4(
            F.max(
                F.when(
                    (F.col("ta") > 0) & (F.col("tb") > 0),
                    F.abs(F.col("ca") / F.col("ta") - F.col("cb") / F.col("tb")),
                )
            )
        ).alias("ks_d"),
    )


ORACLES["ks_test"] = f"""
    WITH per_v AS (
      SELECT value AS v,
             SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS na,
             SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS nb
      FROM events WHERE event_type IN ('click', 'purchase')
        AND value IS NOT NULL
      GROUP BY value
    ), cum AS (
      SELECT SUM(na) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
             SUM(nb) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb,
             SUM(na) OVER () AS ta,
             SUM(nb) OVER () AS tb
      FROM per_v
    )
    SELECT CAST(MAX(ta) AS BIGINT) AS n_click,
           CAST(MAX(tb) AS BIGINT) AS n_purchase,
           {R("MAX(CASE WHEN ta > 0 AND tb > 0 "
              "THEN ABS(ca / ta - cb / tb) END)")} AS ks_d
    FROM cum
"""
QUERIES["ks_test"] = q_ks_test


def q_mannwhitney_u(spark, sf):
    """Mann-Whitney U rank-sum test (click vs purchase `value`), with
    midrank tie handling and the tie-corrected normal approximation.
    Same scale shape as ks_test: ranks are derived from a cumulative
    window over DISTINCT values (midrank = run start + (run len + 1)/2),
    never a global per-row sort, so the window input is value-cardinality
    bounded. Output: group sizes, U for the click side, tie-corrected z.

    NULL values filtered on both sides (engine NULL-ordering divergence,
    see ks_test) and the z denominator guarded so sigma2 = 0 (all values
    tied, or an empty group) yields NULL in both engines."""
    e = _events(spark, sf).where(
        F.col("event_type").isin("click", "purchase")
        & F.col("value").isNotNull()
    )
    per_v = e.groupBy(F.col("value").alias("v")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("na_v"),
    )
    from batch_processing_pipeline_spark.operators.rank import (
        exact_global_cumagg,
    )

    # midranks from the range-sharded running count (round 9 — the
    # distinct-value support is the ks_test scale case); integer sums,
    # so the re-association is exact
    ranked = exact_global_cumagg(
        per_v, [F.col("v").asc()], [("ccnt", "cnt", "sum")]
    ).select(
        "cnt",
        "na_v",
        (
            (F.col("ccnt") - F.col("cnt")).cast("double")
            + (F.col("cnt").cast("double") + 1.0) / 2.0
        ).alias("avg_rank"),
    )
    agg = ranked.agg(
        F.sum("cnt").cast("double").alias("n"),
        F.sum("na_v").cast("double").alias("na"),
        F.sum(F.col("na_v").cast("double") * F.col("avg_rank")).alias("sr_a"),
        F.sum(
            F.pow(F.col("cnt").cast("double"), F.lit(3.0))
            - F.col("cnt").cast("double")
        ).alias("ties"),
    )
    nb = F.col("n") - F.col("na")
    u = F.col("sr_a") - F.col("na") * (F.col("na") + 1.0) / 2.0
    mu = F.col("na") * nb / 2.0
    sigma2 = (
        F.col("na")
        * nb
        / 12.0
        * ((F.col("n") + 1.0) - F.col("ties") / (F.col("n") * (F.col("n") - 1.0)))
    )
    return agg.select(
        F.col("na").cast("long").alias("n_click"),
        nb.cast("long").alias("n_purchase"),
        round4(u).alias("u_stat"),
        round4(F.when(sigma2 > 0, (u - mu) / F.sqrt(sigma2))).alias("z_score"),
    )


ORACLES["mannwhitney_u"] = f"""
    WITH per_v AS (
      SELECT value AS v, COUNT(*) AS cnt,
             SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS na_v
      FROM events WHERE event_type IN ('click', 'purchase')
        AND value IS NOT NULL
      GROUP BY value
    ), ranked AS (
      SELECT cnt, na_v,
             CAST(SUM(cnt) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt
               AS DOUBLE) + (CAST(cnt AS DOUBLE) + 1.0) / 2.0 AS avg_rank
      FROM per_v
    ), agg AS (
      SELECT CAST(SUM(cnt) AS DOUBLE) AS n,
             CAST(SUM(na_v) AS DOUBLE) AS na,
             SUM(CAST(na_v AS DOUBLE) * avg_rank) AS sr_a,
             SUM(POW(CAST(cnt AS DOUBLE), 3.0) - CAST(cnt AS DOUBLE)) AS ties
      FROM ranked
    )
    SELECT CAST(na AS BIGINT) AS n_click,
           CAST(n - na AS BIGINT) AS n_purchase,
           {R("sr_a - na * (na + 1.0) / 2.0")} AS u_stat,
           {R("CASE WHEN na * (n - na) / 12.0 * "
              "((n + 1.0) - ties / (n * (n - 1.0))) > 0 THEN "
              "(sr_a - na * (na + 1.0) / 2.0 - na * (n - na) / 2.0) / "
              "SQRT(na * (n - na) / 12.0 * "
              "((n + 1.0) - ties / (n * (n - 1.0)))) END")} AS z_score
    FROM agg
"""
QUERIES["mannwhitney_u"] = q_mannwhitney_u


def q_acf_daily(spark, sf):
    """Autocorrelation of the daily event-count series at lags 1..7 —
    the standard biased estimator r_k = sum_t (x_t - x̄)(x_{t+k} - x̄) /
    sum_t (x_t - x̄)². The raw log collapses to one row per day before
    anything else runs, so the lag self-join and the mean broadcast touch
    a series-length relation (30 rows here, ~36.5k rows even for a century
    of days) — the 100-TB cost is the first groupBy, which is a plain
    partial-aggregated count."""
    e = _events(spark, sf)
    daily = e.groupBy(
        F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("day_num")
    ).agg(F.count(F.lit(1)).cast("double").alias("x"))
    stats = daily.agg(F.avg("x").alias("xbar"))
    dev = daily.crossJoin(F.broadcast(stats)).select(
        "day_num", (F.col("x") - F.col("xbar")).alias("d")
    )
    denom = dev.agg(F.sum(F.col("d") * F.col("d")).alias("denom"))
    lags = spark.range(1, 8).select(F.col("id").cast("int").alias("lag"))
    pairs = (
        dev.alias("a")
        .crossJoin(F.broadcast(lags))
        .join(
            dev.alias("b"),
            F.col("b.day_num") == F.col("a.day_num") + F.col("lag"),
        )
        .groupBy("lag")
        .agg(F.sum(F.col("a.d") * F.col("b.d")).alias("num"))
    )
    return (
        pairs.crossJoin(F.broadcast(denom))
        .select(
            F.col("lag").cast("long").alias("lag"),
            round4(F.col("num") / F.col("denom")).alias("acf"),
        )
    )


ORACLES["acf_daily"] = f"""
    WITH daily AS (
      SELECT CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS day_num,
             CAST(COUNT(*) AS DOUBLE) AS x
      FROM events GROUP BY 1
    ), stats AS (
      SELECT AVG(x) AS xbar FROM daily
    ), dev AS (
      SELECT day_num, x - (SELECT xbar FROM stats) AS d FROM daily
    ), denom AS (
      SELECT SUM(d * d) AS denom FROM dev
    ), lags AS (
      SELECT UNNEST([1, 2, 3, 4, 5, 6, 7]) AS lag
    )
    SELECT CAST(l.lag AS BIGINT) AS lag,
           {R("SUM(a.d * b.d) / (SELECT denom FROM denom)")} AS acf
    FROM lags l
    JOIN dev a ON TRUE
    JOIN dev b ON b.day_num = a.day_num + l.lag
    GROUP BY l.lag
"""
QUERIES["acf_daily"] = q_acf_daily


def q_zipf_fit(spark, sf):
    """Zipf's-law fit over the corpus vocabulary: OLS of ln(frequency) on
    ln(rank) — slope near -1 is the natural-text signature, a flat or
    bimodal fit flags templated/synthetic corpora (a standard pretrain
    curation diagnostic). Tokenize on the literal single space (the
    portable split — regex whitespace classes drift between engines),
    rank with a deterministic (count DESC, word ASC) tie-break, and
    reduce the log-log cloud to the five OLS sums in one aggregate.
    The vocabulary rank is an exact range-partitioned global rank
    (operators/rank.py — round 9): a 100 TB corpus's distinct vocabulary
    is itself huge, so no unpartitioned window may see it."""
    from batch_processing_pipeline_spark.operators.rank import exact_global_rank

    d = _t(spark, sf, "documents")
    words = d.select(
        F.explode(F.split("text", " ", -1)).alias("w")
    ).where(F.col("w") != "")
    freq = words.groupBy("w").agg(F.count(F.lit(1)).alias("n"))
    pts = exact_global_rank(
        freq, [F.col("n").desc(), F.col("w").asc()], out_col="__r"
    ).select(
        F.log(F.col("__r").cast("double")).alias("x"),
        F.log(F.col("n").cast("double")).alias("y"),
    )
    agg = pts.agg(
        F.count(F.lit(1)).cast("double").alias("m"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    vxy = F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")
    vxx = F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")
    vyy = F.col("m") * F.col("syy") - F.col("sy") * F.col("sy")
    return agg.select(
        F.col("m").cast("long").alias("n_types"),
        round4(vxy / vxx).alias("slope"),
        round4((F.col("sy") - (vxy / vxx) * F.col("sx")) / F.col("m")).alias(
            "intercept"
        ),
        round4(vxy * vxy / (vxx * vyy)).alias("r2"),
    )


ORACLES["zipf_fit"] = f"""
    WITH words AS (
      SELECT UNNEST(string_split(text, ' ')) AS w FROM documents
    ), freq AS (
      SELECT w, COUNT(*) AS n FROM words WHERE w <> '' GROUP BY w
    ), pts AS (
      SELECT ln(CAST(ROW_NUMBER() OVER (ORDER BY n DESC, w ASC) AS DOUBLE)) AS x,
             ln(CAST(n AS DOUBLE)) AS y
      FROM freq
    ), agg AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS m,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
      FROM pts
    )
    SELECT CAST(m AS BIGINT) AS n_types,
           {R("(m * sxy - sx * sy) / (m * sxx - sx * sx)")} AS slope,
           {R("(sy - (m * sxy - sx * sy) / (m * sxx - sx * sx) * sx) / m")}
               AS intercept,
           {R("(m * sxy - sx * sy) * (m * sxy - sx * sy) / "
              "((m * sxx - sx * sx) * (m * syy - sy * sy))")} AS r2
    FROM agg
"""
QUERIES["zipf_fit"] = q_zipf_fit


# --------------------------------------------------------------------------
# Survival / market-basket / information-theory / robust-regression surface.
# Same charter extension as the statistics batch above: classic analytics a
# query-log engine is asked for, each expressed as one declarative plan with
# cardinality-bounded global windows and a DuckDB oracle twin.
# --------------------------------------------------------------------------


def q_kaplan_meier(spark, sf):
    """Kaplan-Meier product-limit estimator of time-to-first-purchase with
    a 7-day administrative censoring window (the standard "conversion
    within the attribution window" survival curve). Per-user durations
    collapse the raw log first (one groupBy), the risk-set recursion runs
    over DISTINCT observed durations (<= 8 rows regardless of data size),
    and the product-limit is exp(sum(ln(1 - d/n))) with an explicit
    zero-factor guard so engines agree when the last risk set empties."""
    tau = 7
    e = _events(spark, sf)
    per_user = e.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("d0"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.to_date("ts"))
        ).alias("dp"),
    )
    dur = per_user.select(
        F.when(
            F.col("dp").isNotNull()
            & (F.datediff("dp", "d0") <= tau),
            F.datediff("dp", "d0"),
        )
        .otherwise(F.lit(tau))
        .alias("t"),
        F.when(
            F.col("dp").isNotNull() & (F.datediff("dp", "d0") <= tau), 1
        )
        .otherwise(0)
        .alias("event"),
    )
    grp = dur.groupBy("t").agg(
        F.sum("event").alias("d"),
        F.sum(F.lit(1) - F.col("event")).alias("c"),
    )
    w_cum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    w_tot = Window.partitionBy()
    risk = grp.select(
        "t",
        "d",
        "c",
        (
            F.sum(F.col("d") + F.col("c")).over(w_tot)
            - F.sum(F.col("d") + F.col("c")).over(w_cum)
            + F.col("d")
            + F.col("c")
        ).alias("n_risk"),
    )
    factor = 1.0 - F.col("d").cast("double") / F.col("n_risk").cast("double")
    surv = risk.select(
        "t",
        "d",
        "c",
        "n_risk",
        F.max(F.when(factor <= 0.0, 1).otherwise(0)).over(w_cum).alias("hit0"),
        F.sum(F.log(F.when(factor > 0.0, factor).otherwise(F.lit(1.0)))).over(
            w_cum
        ).alias("lnS"),
    )
    return surv.select(
        F.col("t").cast("long").alias("t_days"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d").cast("long").alias("n_events"),
        F.col("c").cast("long").alias("n_censored"),
        round4(
            F.when(F.col("hit0") == 1, F.lit(0.0)).otherwise(F.exp("lnS"))
        ).alias("km_survival"),
    )


ORACLES["kaplan_meier"] = f"""
    WITH per_user AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS d0,
             MIN(CASE WHEN event_type = 'purchase'
                      THEN CAST(ts AS DATE) END) AS dp
      FROM events GROUP BY user_id
    ), dur AS (
      SELECT CASE WHEN dp IS NOT NULL AND dp - d0 <= 7
                  THEN CAST(dp - d0 AS BIGINT) ELSE 7 END AS t,
             CASE WHEN dp IS NOT NULL AND dp - d0 <= 7 THEN 1 ELSE 0 END
               AS event
      FROM per_user
    ), grp AS (
      SELECT t, SUM(event) AS d, SUM(1 - event) AS c FROM dur GROUP BY t
    ), risk AS (
      SELECT t, d, c,
             SUM(d + c) OVER () - SUM(d + c) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + d + c
               AS n_risk
      FROM grp
    ), surv AS (
      SELECT t, d, c, n_risk,
             MAX(CASE WHEN 1.0 - CAST(d AS DOUBLE) / n_risk <= 0.0
                      THEN 1 ELSE 0 END) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hit0,
             SUM(ln(CASE WHEN 1.0 - CAST(d AS DOUBLE) / n_risk > 0.0
                         THEN 1.0 - CAST(d AS DOUBLE) / n_risk
                         ELSE 1.0 END)) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lnS
      FROM risk
    )
    SELECT CAST(t AS BIGINT) AS t_days,
           CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d AS BIGINT) AS n_events,
           CAST(c AS BIGINT) AS n_censored,
           {R("CASE WHEN hit0 = 1 THEN 0.0 ELSE EXP(lnS) END")} AS km_survival
    FROM surv
"""
QUERIES["kaplan_meier"] = q_kaplan_meier


def q_basket_lift(spark, sf):
    """Market-basket association rules over order baskets: support,
    confidence, and lift for co-purchased part pairs, top-20 by lift with
    a deterministic tie-break. The pair generation is a within-order
    self-join on the DISTINCT (order, part) relation — candidate count is
    bounded by sum(basket_width²), never |parts|² — and the margins join
    back on plain equi-keys; only the final bounded top-20 sorts
    globally. min pair count 2 drops the rare-pair lift explosion."""
    li = (
        _t(spark, sf, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n_orders = li.select(F.countDistinct("l_orderkey").alias("n_orders"))
    item = li.groupBy(F.col("l_partkey").alias("p")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb")
        )
        .agg(F.count(F.lit(1)).alias("pair_n"))
        .where(F.col("pair_n") >= 2)
    )
    scored = (
        pairs.join(item.withColumnRenamed("p", "pa").withColumnRenamed("cnt", "ca"), "pa")
        .join(item.withColumnRenamed("p", "pb").withColumnRenamed("cnt", "cb"), "pb")
        .crossJoin(F.broadcast(n_orders))
        .select(
            F.col("pa").cast("long").alias("pa"),
            F.col("pb").cast("long").alias("pb"),
            F.col("pair_n").cast("long").alias("pair_n"),
            round4(F.col("pair_n") / F.col("n_orders")).alias("support"),
            round4(F.col("pair_n") / F.col("ca")).alias("confidence"),
            round4(
                F.col("pair_n").cast("double")
                * F.col("n_orders")
                / (F.col("ca").cast("double") * F.col("cb"))
            ).alias("lift"),
        )
    )
    return scored.orderBy(
        F.col("lift").desc(), F.col("pa").asc(), F.col("pb").asc()
    ).limit(20)


ORACLES["basket_lift"] = f"""
    WITH li AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), n_o AS (
      SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM li
    ), item AS (
      SELECT l_partkey AS p, COUNT(*) AS cnt FROM li GROUP BY 1
    ), pairs AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS pair_n
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    )
    SELECT CAST(pa AS BIGINT) AS pa, CAST(pb AS BIGINT) AS pb,
           CAST(pair_n AS BIGINT) AS pair_n,
           {R("pair_n / (SELECT CAST(n_orders AS DOUBLE) FROM n_o)")}
             AS support,
           {R("pair_n / CAST(ia.cnt AS DOUBLE)")} AS confidence,
           {R("CAST(pair_n AS DOUBLE) * (SELECT n_orders FROM n_o) / "
              "(CAST(ia.cnt AS DOUBLE) * ib.cnt)")} AS lift
    FROM pairs
    JOIN item ia ON ia.p = pa
    JOIN item ib ON ib.p = pb
    ORDER BY lift DESC, pa ASC, pb ASC
    LIMIT 20
"""
QUERIES["basket_lift"] = q_basket_lift


def q_pareto_abc(spark, sf):
    """ABC / Pareto classification of parts by revenue: rank parts by
    net revenue, take the cumulative revenue share (deterministic
    revenue-desc, partkey-asc order), and bucket A (first 80% of
    revenue), B (to 95%), C (tail); report each class's size, revenue,
    and share. The global cumulative window runs over the per-part
    aggregate — dimension-sized, not fact-sized; the fact-table pass is
    one partial-aggregated groupBy."""
    li = _t(spark, sf, "lineitem")
    # per-part revenue as exact long 1e-4-dollar units (r12 sweep): the
    # rollup, the cumulative shards, and the class sums are then all
    # order-free integer arithmetic in both engines
    # rev feeds the range-sharded cumagg's PIN JOB (build time) plus TWO
    # broadcast total subtrees in the final action — cross-job, so the
    # fact-table groupBy ran up to three times (round-12 fourth session;
    # the quantile_normalize pattern). The pin job populates this cache.
    rev = li.groupBy(F.col("l_partkey").alias("p")).agg(
        F.sum(
            cents(F.col("l_extendedprice"))
            * (F.lit(100).cast("long") - cents(F.col("l_discount")))
        ).alias("rev_u")
    ).persist()
    from batch_processing_pipeline_spark.operators.rank import (
        exact_global_cumagg,
    )

    # the class boundary is tested on a round4-ed share: Spark's running
    # window sum, DuckDB's segment-tree window aggregation, AND the
    # range-sharded cumagg (round 9 — partition partials + offset) can
    # all associate float additions differently, so a raw cum_share
    # within ~1ulp of 0.80/0.95 could flip class between engines
    # (ADVICE r4); the part dimension is SF-growing, hence no
    # whole-relation window
    classed = exact_global_cumagg(
        rev,
        [F.col("rev_u").desc(), F.col("p").asc()],
        [("cum_rev", "rev_u", "sum")],
    ).crossJoin(
        F.broadcast(rev.agg(F.sum("rev_u").alias("__t")))
    ).select(
        "p",
        "rev_u",
        round4(
            F.col("cum_rev").cast("double") / F.col("__t").cast("double")
        ).alias("cum_share"),
    ).select(
        "p",
        "rev_u",
        F.when(F.col("cum_share") <= 0.80, "A")
        .when(F.col("cum_share") <= 0.95, "B")
        .otherwise("C")
        .alias("abc_class"),
    )
    tot = rev.agg(F.sum("rev_u").alias("tot"))
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum("rev_u").alias("_rev_u"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "abc_class",
            "n_parts",
            round4(F.col("_rev_u") / F.lit(10000.0)).alias("class_revenue"),
            round4(
                F.col("_rev_u").cast("double") / F.col("tot").cast("double")
            ).alias("revenue_share"),
        )
    )


ORACLES["pareto_abc"] = f"""
    WITH rev AS (
      SELECT l_partkey AS p,
             SUM({sql_cents('l_extendedprice')} * (100 - {sql_cents('l_discount')})) AS rev_u
      FROM lineitem GROUP BY 1
    ), classed AS (
      SELECT p, rev_u,
             CASE WHEN {R("CAST(SUM(rev_u) OVER (ORDER BY rev_u DESC, p ASC "
                          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
                          " AS DOUBLE) / CAST(SUM(rev_u) OVER () AS DOUBLE)")} <= 0.80 THEN 'A'
                  WHEN {R("CAST(SUM(rev_u) OVER (ORDER BY rev_u DESC, p ASC "
                          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
                          " AS DOUBLE) / CAST(SUM(rev_u) OVER () AS DOUBLE)")} <= 0.95 THEN 'B'
                  ELSE 'C' END AS abc_class
      FROM rev
    )
    SELECT abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           {R("SUM(rev_u) / CAST(10000.0 AS DOUBLE)")} AS class_revenue,
           {R("CAST(SUM(rev_u) AS DOUBLE) / CAST((SELECT SUM(rev_u) FROM rev) AS DOUBLE)")}
             AS revenue_share
    FROM classed GROUP BY abc_class
"""
QUERIES["pareto_abc"] = q_pareto_abc


def q_mutual_info(spark, sf):
    """Mutual information (nats) between event_type and day-of-week,
    with marginal entropies and the normalized MI — the standard
    dependence audit between two categoricals. All probability terms are
    windowed sums over the JOINT aggregate (<= |X|·|Y| rows), so after
    the one fact-table groupBy everything is dimension-sized. Day-of-week
    is epoch-day mod 7 (portable across engines; no locale/WEEKDAY
    semantics)."""
    e = _events(spark, sf)
    joint = e.groupBy(
        "event_type",
        (F.datediff(F.to_date("ts"), F.lit("2024-01-01")) % 7).alias("dow"),
    ).agg(F.count(F.lit(1)).cast("double").alias("nxy"))
    w_x = Window.partitionBy("event_type")
    w_y = Window.partitionBy("dow")
    w_all = Window.partitionBy()
    terms = joint.select(
        "nxy",
        F.sum("nxy").over(w_x).alias("nx"),
        F.sum("nxy").over(w_y).alias("ny"),
        F.sum("nxy").over(w_all).alias("n"),
    )
    p = F.col("nxy") / F.col("n")
    px = F.col("nx") / F.col("n")
    py = F.col("ny") / F.col("n")
    agg = terms.agg(
        F.sum(p * F.log(p / (px * py))).alias("mi"),
        F.sum(-p * F.log(px)).alias("_hx_terms"),
        F.sum(-p * F.log(py)).alias("_hy_terms"),
    )
    return agg.select(
        round4(F.col("mi")).alias("mi_nats"),
        round4(F.col("_hx_terms")).alias("h_event_type"),
        round4(F.col("_hy_terms")).alias("h_dow"),
        round4(
            F.col("mi") / F.sqrt(F.col("_hx_terms") * F.col("_hy_terms"))
        ).alias("nmi"),
    )


ORACLES["mutual_info"] = f"""
    WITH joint AS (
      SELECT event_type,
             CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) % 7 AS dow,
             CAST(COUNT(*) AS DOUBLE) AS nxy
      FROM events GROUP BY 1, 2
    ), terms AS (
      SELECT nxy,
             SUM(nxy) OVER (PARTITION BY event_type) AS nx,
             SUM(nxy) OVER (PARTITION BY dow) AS ny,
             SUM(nxy) OVER () AS n
      FROM joint
    ), agg AS (
      SELECT SUM(nxy / n * ln((nxy / n) / ((nx / n) * (ny / n)))) AS mi,
             SUM(-(nxy / n) * ln(nx / n)) AS hx,
             SUM(-(nxy / n) * ln(ny / n)) AS hy
      FROM terms
    )
    SELECT {R("mi")} AS mi_nats,
           {R("hx")} AS h_event_type,
           {R("hy")} AS h_dow,
           {R("mi / SQRT(hx * hy)")} AS nmi
    FROM agg
"""
QUERIES["mutual_info"] = q_mutual_info


def q_theil_sen(spark, sf):
    """Theil-Sen robust trend estimate of the daily event-count series:
    the median of all pairwise slopes, with the median-residual
    intercept. The raw log collapses to one row per day first, so the
    pairwise self-join is series-length-bounded (O(365²/2) pairs even
    for a year of days — a dimension-scale relation), never fact-sized;
    both medians are exact interpolated percentiles."""
    e = _events(spark, sf)
    daily = e.groupBy(
        F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("d")
    ).agg(F.count(F.lit(1)).cast("double").alias("x"))
    a, b = daily.alias("a"), daily.alias("b")
    slopes = a.join(b, F.col("b.d") > F.col("a.d")).select(
        (
            (F.col("b.x") - F.col("a.x"))
            / (F.col("b.d") - F.col("a.d")).cast("double")
        ).alias("slope")
    )
    med_slope = slopes.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.percentile("slope", F.lit(0.5)).alias("m"),
    )
    resid = daily.crossJoin(F.broadcast(med_slope)).select(
        "n_pairs",
        "m",
        (F.col("x") - F.col("m") * F.col("d")).alias("r"),
    )
    return resid.groupBy("n_pairs", "m").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.percentile("r", F.lit(0.5)).alias("_b"),
    ).select(
        "n_days",
        "n_pairs",
        round4(F.col("m")).alias("slope"),
        round4(F.col("_b")).alias("intercept"),
    )


ORACLES["theil_sen"] = f"""
    WITH daily AS (
      SELECT CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS d,
             CAST(COUNT(*) AS DOUBLE) AS x
      FROM events GROUP BY 1
    ), slopes AS (
      SELECT (b.x - a.x) / CAST(b.d - a.d AS DOUBLE) AS slope
      FROM daily a JOIN daily b ON b.d > a.d
    ), ms AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
             quantile_cont(slope, 0.5) AS m
      FROM slopes
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           (SELECT n_pairs FROM ms) AS n_pairs,
           {R("(SELECT m FROM ms)")} AS slope,
           {R("quantile_cont(x - (SELECT m FROM ms) * d, 0.5)")} AS intercept
    FROM daily
"""
QUERIES["theil_sen"] = q_theil_sen


