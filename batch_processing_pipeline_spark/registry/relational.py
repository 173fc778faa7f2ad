"""Registry section: TPC-H registration (plans/tpch.py) and the approximate-percentile 100-TB twins.

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
    pd,
    round4,
)

# ------------------------------------------------------------------ TPC-H
# The classic decision-support suite (plans/tpch.py), adapted to the
# fixture schema where columns are trimmed; see module docstring there.
from batch_processing_pipeline_spark.plans.tpch import (  # noqa: E402
    TPCH_ORACLES,
    TPCH_QUERIES,
)

QUERIES.update(TPCH_QUERIES)
ORACLES.update(TPCH_ORACLES)


def q_perplexity(spark, sf):
    """Unigram language-model perplexity per document (bits/token): train
    word probabilities on the corpus itself, score each document by the
    mean negative log2 probability of its tokens — the classic
    quality/novelty signal for pretraining-data curation.

    Scale shape: one token explode feeds BOTH the vocabulary aggregate and
    the scoring join; the corpus total is a single broadcast row. The
    vocab join is an equi-join on the token string — at 100 TB the vocab
    relation is Zipf-compact (≪ corpus) and AQE picks broadcast vs
    shuffled-hash from its measured size.
    """
    d = _t(spark, sf, "documents")
    s = F.lower(F.trim(F.col("text")))
    toks = (
        d.select("doc_id", F.split(s, r"\s+").alias("t"))
        .where((F.size("t") >= 1) & (F.length(F.trim(F.col("text"))) > 0))
        .select("doc_id", F.explode("t").alias("w"))
        .where(F.length("w") > 0)
    )
    # vocab materialized ONCE (round 12, guide §3.3): it feeds both the
    # corpus total and the scoring join — and the total is DERIVED from
    # it (Σ n_w == corpus token count exactly), which deletes the third
    # full explode+count pass the old separate total aggregate paid.
    # The relation is vocabulary-sized (Zipf-compact at any scale).
    # Output identical (exceptAll 0 both ways; oracle re-green ×3
    # scales). Same-session A/B at sf0.1: 1.06 → 0.99 s.
    vocab = (
        toks.groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_w"))
        .localCheckpoint(eager=True)
    )
    total = vocab.agg(F.sum("n_w").cast("double").alias("n_total"))
    scored = (
        toks.join(vocab, "w")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            round4(
                F.avg(-F.log2(F.col("n_w").cast("double") / F.col("n_total")))
            ).alias("ppl_bits"),
        )
    )
    return scored


ORACLES["perplexity"] = rf"""
    WITH tk AS (
      SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
      FROM documents WHERE length(trim(text)) > 0
    ), toks AS (
      SELECT doc_id, w FROM tk WHERE length(w) > 0
    ), vocab AS (
      SELECT w, COUNT(*) AS n_w FROM toks GROUP BY w
    ), total AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_total FROM toks
    )
    SELECT t.doc_id, COUNT(*) AS n_tokens,
           {R("AVG(-log2(CAST(v.n_w AS DOUBLE) / tt.n_total))")} AS ppl_bits
    FROM toks t JOIN vocab v ON t.w = v.w CROSS JOIN total tt
    GROUP BY t.doc_id
"""
QUERIES["perplexity"] = q_perplexity


def q_pmi_collocations(spark, sf):
    """Pointwise-mutual-information collocations: adjacent word pairs that
    co-occur far more than their unigram frequencies predict (PMI =
    log2(p(ab) / (p(a)·p(b)))), min pair count 5 — the standard
    phrase-mining signal.

    One tokenization pass feeds unigram counts, pair counts, and the two
    scalar totals (broadcast rows); everything else is equi-joins on the
    word strings.
    """
    d = _t(spark, sf, "documents")
    s = F.lower(F.trim(F.col("text")))
    tok = (
        d.select(F.split(s, r"\s+").alias("t"))
        .where(F.length(F.trim(F.col("text"))) > 0)
    )
    uni = (
        tok.select(F.explode("t").alias("w"))
        .where(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    n_words = uni.agg(F.sum("n").cast("double").alias("nw"))
    pairs = (
        tok.where(F.size("t") >= 2)
        .select(
            F.explode(F.sequence(F.lit(1), F.size("t") - F.lit(1))).alias("i"), "t"
        )
        .select(
            F.element_at("t", F.col("i")).alias("w1"),
            F.element_at("t", F.col("i") + F.lit(1)).alias("w2"),
        )
        .where((F.length("w1") > 0) & (F.length("w2") > 0))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= 5)
    )
    n_pairs = (
        tok.where(F.size("t") >= 2)
        .select((F.size("t") - F.lit(1)).cast("long").alias("k"))
        .agg(F.sum("k").cast("double").alias("np"))
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("n").alias("n_a"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("n").alias("n_b"))
    pmi = F.log2(
        (F.col("n_ab").cast("double") / F.col("np"))
        / (
            (F.col("n_a").cast("double") / F.col("nw"))
            * (F.col("n_b").cast("double") / F.col("nw"))
        )
    )
    return (
        pairs.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(n_words))
        .crossJoin(F.broadcast(n_pairs))
        .select("w1", "w2", "n_ab", round4(pmi).alias("pmi"))
    )


ORACLES["pmi_collocations"] = rf"""
    WITH tk AS (
      SELECT string_split_regex(lower(trim(text)), '\s+') AS t
      FROM documents WHERE length(trim(text)) > 0
    ), uni AS (
      SELECT w, COUNT(*) AS n FROM (
        SELECT unnest(t) AS w FROM tk
      ) WHERE length(w) > 0 GROUP BY w
    ), nw AS (SELECT CAST(SUM(n) AS DOUBLE) AS nw FROM uni),
    pr AS (
      SELECT t[i] AS w1, t[i + 1] AS w2
      FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
            FROM tk WHERE len(t) >= 2)
    ), pairs AS (
      SELECT w1, w2, COUNT(*) AS n_ab FROM pr
      WHERE length(w1) > 0 AND length(w2) > 0
      GROUP BY w1, w2 HAVING COUNT(*) >= 5
    ), np AS (
      SELECT CAST(SUM(len(t) - 1) AS DOUBLE) AS np FROM tk WHERE len(t) >= 2
    )
    SELECT p.w1, p.w2, p.n_ab,
           {R("log2((CAST(p.n_ab AS DOUBLE) / np.np)"
              " / ((CAST(a.n AS DOUBLE) / nw.nw) * (CAST(b.n AS DOUBLE) / nw.nw)))")}
               AS pmi
    FROM pairs p
    JOIN uni a ON p.w1 = a.w
    JOIN uni b ON p.w2 = b.w
    CROSS JOIN nw CROSS JOIN np
"""
QUERIES["pmi_collocations"] = q_pmi_collocations


def q_doc_keywords(spark, sf):
    """Top-3 keywords per document by TF-IDF (idf = ln((D+1)/(df+1)) + 1,
    ties to the lexicographically smaller term) — per-document keyword
    extraction, the argmax companion to the corpus-level ``tfidf`` query.
    """
    d = _t(spark, sf, "documents")
    s = F.lower(F.trim(F.col("text")))
    toks = (
        d.select("doc_id", F.split(s, r"\s+").alias("t"))
        .where(F.length(F.trim(F.col("text"))) > 0)
        .select("doc_id", F.explode("t").alias("w"))
        .where(F.length("w") > 0)
    )
    tf = toks.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    n_docs = (
        d.where(F.length(F.trim(F.col("text"))) > 0)
        .agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    )
    idf = F.log(
        (F.col("n_docs") + F.lit(1.0)) / (F.col("df").cast("double") + F.lit(1.0))
    ) + F.lit(1.0)
    scored = (
        tf.join(df_, "w")
        .crossJoin(F.broadcast(n_docs))
        .select("doc_id", "w", (F.col("tf").cast("double") * idf).alias("score"))
    )
    wr = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("w"))
    return (
        scored.withColumn("rk", F.row_number().over(wr))
        .where(F.col("rk") <= 3)
        .select("doc_id", F.col("rk").cast("int").alias("rk"), "w",
                round4(F.col("score")).alias("score"))
    )


ORACLES["doc_keywords"] = rf"""
    WITH toks AS (
      SELECT doc_id, w FROM (
        SELECT doc_id,
               unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
        FROM documents WHERE length(trim(text)) > 0
      ) WHERE length(w) > 0
    ), tf AS (
      SELECT doc_id, w, COUNT(*) AS tf FROM toks GROUP BY doc_id, w
    ), df AS (
      SELECT w, COUNT(*) AS df FROM tf GROUP BY w
    ), nd AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents
      WHERE length(trim(text)) > 0
    ), scored AS (
      SELECT tf.doc_id, tf.w,
             CAST(tf.tf AS DOUBLE)
               * (ln((nd.n_docs + CAST(1.0 AS DOUBLE))
                     / (CAST(df.df AS DOUBLE) + CAST(1.0 AS DOUBLE)))
                  + CAST(1.0 AS DOUBLE)) AS score
      FROM tf JOIN df ON tf.w = df.w CROSS JOIN nd
    ), ranked AS (
      SELECT doc_id, w, score,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, w ASC) AS rk
      FROM scored
    )
    SELECT doc_id, CAST(rk AS INTEGER) AS rk, w, {R("score")} AS score
    FROM ranked WHERE rk <= 3
"""
QUERIES["doc_keywords"] = q_doc_keywords


def q_rfm_scores(spark, sf):
    """RFM customer segmentation: recency (days since last order, against
    the corpus max date), frequency (order count), monetary (total spend),
    each scored 1–3 by equi-depth terciles.

    The tercile boundaries come from ONE tiny aggregate row broadcast back
    (same no-global-sort shape as ``equidepth_buckets``); scoring is a
    map-side sum of comparisons.

    Monetary is summed as exact integer CENTS (sf1 lesson): a double sum
    is partial-sum-order-dependent, and with K-replicated fixtures many
    customers TIE exactly at a tercile boundary — one ULP of engine- or
    layout-dependent noise then flips ``monetary > m1`` and the m_score
    hash. Integer summation is associative, so the boundary comparison
    is exact in both engines at every scale.
    """
    o = _t(spark, sf, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).cast("long").alias("freq"),
        F.sum(cents(F.col("o_totalprice"))).alias("monetary_c"),
    )
    anchor = o.agg(F.max("o_orderdate").alias("max_date"))
    rfm = per_cust.crossJoin(F.broadcast(anchor)).select(
        "o_custkey",
        F.datediff("max_date", "last_order").cast("long").alias("recency_days"),
        "freq",
        "monetary_c",
    )
    bounds = rfm.agg(
        *[
            F.percentile(c, F.lit(q)).alias(f"_{c}{i}")
            for c in ("recency_days", "freq", "monetary_c")
            for i, q in ((1, 1 / 3), (2, 2 / 3))
        ]
    )
    def score(c):
        return (
            F.lit(1)
            + F.when(F.col(c) > F.col(f"_{c}1"), 1).otherwise(0)
            + F.when(F.col(c) > F.col(f"_{c}2"), 1).otherwise(0)
        ).cast("int")
    return rfm.crossJoin(F.broadcast(bounds)).select(
        "o_custkey",
        "recency_days",
        "freq",
        round4(F.col("monetary_c") / 100.0).alias("monetary"),
        # low recency = GOOD, so the r score inverts the tercile
        (F.lit(4) - score("recency_days")).cast("int").alias("r_score"),
        score("freq").alias("f_score"),
        score("monetary_c").alias("m_score"),
    )


ORACLES["rfm_scores"] = f"""
    WITH per_cust AS (
      SELECT o_custkey, MAX(o_orderdate) AS last_order,
             CAST(COUNT(*) AS BIGINT) AS freq,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS monetary_c
      FROM orders GROUP BY o_custkey
    ), anchor AS (SELECT MAX(o_orderdate) AS max_date FROM orders),
    rfm AS (
      SELECT o_custkey,
             CAST(date_diff('day', last_order, max_date) AS BIGINT) AS recency_days,
             freq, monetary_c
      FROM per_cust CROSS JOIN anchor
    ), b AS (
      SELECT quantile_cont(recency_days, 1.0/3) AS r1, quantile_cont(recency_days, 2.0/3) AS r2,
             quantile_cont(freq, 1.0/3)         AS f1, quantile_cont(freq, 2.0/3)         AS f2,
             quantile_cont(monetary_c, 1.0/3)   AS m1, quantile_cont(monetary_c, 2.0/3)   AS m2
      FROM rfm
    )
    SELECT o_custkey, recency_days, freq, {R("monetary_c / 100.0")} AS monetary,
           CAST(4 - (1 + (CASE WHEN recency_days > r1 THEN 1 ELSE 0 END)
                       + (CASE WHEN recency_days > r2 THEN 1 ELSE 0 END)) AS INTEGER) AS r_score,
           CAST(1 + (CASE WHEN freq > f1 THEN 1 ELSE 0 END)
                  + (CASE WHEN freq > f2 THEN 1 ELSE 0 END) AS INTEGER) AS f_score,
           CAST(1 + (CASE WHEN monetary_c > m1 THEN 1 ELSE 0 END)
                  + (CASE WHEN monetary_c > m2 THEN 1 ELSE 0 END) AS INTEGER) AS m_score
    FROM rfm CROSS JOIN b
"""
QUERIES["rfm_scores"] = q_rfm_scores


def q_hopping_window(spark, sf):
    """Hopping (sliding) window aggregation: 1-hour windows every 30
    minutes over the event stream — each event lands in exactly two
    windows. Uses Spark's native ``window()`` (epoch-aligned); the oracle
    reproduces the window membership arithmetically.

    Scale shape: windowing is a map-side struct projection (a 2× row
    expansion), then an ordinary partial-agg shuffle on (window, type).
    """
    e = _events(spark, sf)
    w = F.window("ts", "1 hour", "30 minutes")
    return (
        e.groupBy(w.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            round4(sum_money(F.col("value"))).alias("sv"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).cast("long").alias("w_start"),
            "event_type",
            "n",
            "sv",
        )
    )


ORACLES["hopping_window"] = f"""
    WITH hopped AS (
      SELECT (CAST(floor(floor(epoch(ts)) / 1800) AS BIGINT) - k.k) * 1800
                 AS w_start,
             event_type, value
      FROM events CROSS JOIN (VALUES (0), (1)) AS k(k)
    )
    SELECT w_start, event_type, COUNT(*) AS n, {R(sql_sum_money('value'))} AS sv
    FROM hopped GROUP BY w_start, event_type
"""
QUERIES["hopping_window"] = q_hopping_window


def q_embed_centroid_dist(spark, sf):
    """Distance of every vector to its LABEL's centroid — the standard
    embedding-space outlier/mislabel signal for curation.

    Scale shape (the codegen bulk formulation, same as ivf.assign_cells_bulk):
    one posexplode to (id, label, dim, v), a (label, dim) partial-agg for
    centroids, an equi-join back on (label, dim), and a map-side-combining
    SUM of squared diffs per id. No interpreted array lambdas touch the
    corpus; everything is whole-stage codegen.
    """
    e = _t(spark, sf, "embeddings")
    dims = e.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos", "v")
    ).select("vec_id", "label", "pos", F.col("v").cast("double").alias("v"))
    cents = dims.groupBy("label", "pos").agg(F.avg("v").alias("c"))
    return (
        dims.join(cents, ["label", "pos"])
        .groupBy("vec_id", "label")
        .agg(
            round4(
                F.sqrt(F.sum((F.col("v") - F.col("c")) * (F.col("v") - F.col("c"))))
            ).alias("dist")
        )
    )


ORACLES["embed_centroid_dist"] = f"""
    WITH dims AS (
      SELECT vec_id, label, p.pos, CAST(embedding[p.pos] AS DOUBLE) AS v
      FROM embeddings
      CROSS JOIN (SELECT unnest(range(1, 65)) AS pos) p
    ), cents AS (
      SELECT label, pos, AVG(v) AS c FROM dims GROUP BY label, pos
    )
    SELECT d.vec_id, d.label,
           {R("sqrt(SUM((d.v - c.c) * (d.v - c.c)))")} AS dist
    FROM dims d JOIN cents c ON d.label = c.label AND d.pos = c.pos
    GROUP BY d.vec_id, d.label
"""
QUERIES["embed_centroid_dist"] = q_embed_centroid_dist


def q_kmeans_assign(spark, sf):
    """Deterministic k-means (k=4, 2 unrolled Lloyd iterations, init = the
    k lowest vec_ids): the coarse-quantizer training step made
    oracle-checkable — unlike ``ivf``'s pyspark.ml path (seeded but
    engine-specific), every step here is reproducible arithmetic.

    Per-point assignment folds squared L2 in FIXED dim order
    (ivf.assign_cells) so both engines compare bit-identical distances;
    the k×64 centroid matrix is collected to the driver between rounds —
    the standard k-means driver loop; at corpus scale the same collect is
    done from a training SAMPLE (ivf.train_centroids) and assignment uses
    the codegen bulk path (ivf.assign_cells_bulk).
    """
    from batch_processing_pipeline_spark.operators.ivf import assign_cells

    k = 4
    e = _t(spark, sf, "embeddings").select("vec_id", "embedding")
    init = [
        [float(x) for x in r.embedding]
        for r in e.where(F.col("vec_id") < k).orderBy("vec_id").collect()
    ]

    def next_centroids(assigned):
        rows = (
            assigned.select("cluster", F.posexplode("embedding").alias("pos", "v"))
            .groupBy("cluster", "pos")
            .agg(F.avg(F.col("v").cast("double")).alias("c"))
            .collect()
        )
        by_cluster: dict[int, dict[int, float]] = {}
        for r in rows:
            by_cluster.setdefault(r.cluster, {})[r.pos] = r.c
        return [
            [by_cluster[cl][p] for p in range(64)] for cl in sorted(by_cluster)
        ]

    a1 = assign_cells(e, init, out_col="_cells").select(
        "vec_id", "embedding", F.element_at("_cells", 1).alias("cluster")
    )
    c1 = next_centroids(a1)
    a2 = assign_cells(e, c1, out_col="_cells").select(
        "vec_id", F.element_at("_cells", 1).cast("int").alias("cluster")
    )
    return a2


def _kmeans_oracle() -> str:
    # fixed-order squared-L2 fold: explicit left-to-right 64-term chain,
    # the same IEEE addition order as ivf.assign_cells's aggregate() fold
    d2 = " + ".join(
        f"(CAST(a.embedding[{i}] AS DOUBLE) - c.cent[{i}])"
        f" * (CAST(a.embedding[{i}] AS DOUBLE) - c.cent[{i}])"
        for i in range(1, 65)
    )
    return f"""
    WITH init AS (
      SELECT vec_id AS cluster,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cent
      FROM embeddings WHERE vec_id < 4
    ), d1 AS (
      SELECT a.vec_id, c.cluster, {d2} AS dist
      FROM embeddings a CROSS JOIN init c
    ), a1 AS (
      SELECT vec_id, cluster FROM (
        SELECT vec_id, cluster,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY dist ASC, cluster ASC) AS rn
        FROM d1
      ) WHERE rn = 1
    ), dims AS (
      SELECT a1.cluster, p.pos, CAST(e.embedding[p.pos] AS DOUBLE) AS v
      FROM embeddings e
      JOIN a1 ON e.vec_id = a1.vec_id
      CROSS JOIN (SELECT unnest(range(1, 65)) AS pos) p
    ), cents1 AS (
      SELECT cluster, list(c ORDER BY pos) AS cent FROM (
        SELECT cluster, pos, AVG(v) AS c FROM dims GROUP BY cluster, pos
      ) GROUP BY cluster
    ), d2_ AS (
      SELECT a.vec_id, c.cluster, {d2} AS dist
      FROM embeddings a CROSS JOIN (
        SELECT ROW_NUMBER() OVER (ORDER BY cluster) - 1 AS cluster, cent
        FROM cents1
      ) c
    )
    SELECT vec_id, CAST(cluster AS INTEGER) AS cluster FROM (
      SELECT vec_id, cluster,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY dist ASC, cluster ASC) AS rn
      FROM d2_
    ) WHERE rn = 1
"""


ORACLES["kmeans_assign"] = _kmeans_oracle()
QUERIES["kmeans_assign"] = q_kmeans_assign


def q_zorder_key(spark, sf):
    """Morton (Z-order) clustering key over (l_partkey, l_suppkey) — the
    layout key ``operators/maintenance.write_zordered`` sorts by. Pure
    long bit-interleaving (codegen; no UDF); the oracle re-derives every
    bit position arithmetically, so any interleave bug breaks the match.
    """
    from batch_processing_pipeline_spark.operators.maintenance import zorder_key

    li = _t(spark, sf, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        zorder_key(["l_partkey", "l_suppkey"], bits=16).alias("z"),
    )


def _zorder_oracle() -> str:
    terms = []
    for j, col in enumerate(("l_partkey", "l_suppkey")):
        for i in range(16):
            terms.append(f"(((({col} & 65535) >> {i}) & 1) << {i * 2 + j})")
    return f"""
    SELECT l_orderkey, l_linenumber,
           CAST({" + ".join(terms)} AS BIGINT) AS z
    FROM lineitem
"""


ORACLES["zorder_key"] = _zorder_oracle()
QUERIES["zorder_key"] = q_zorder_key


def q_mad_outliers(spark, sf):
    """Robust outlier flagging via median absolute deviation: per event
    type, score = |v - median| / (1.4826 x MAD); keep score > 3. Unlike the
    z-score query (``outliers``), a few extreme values cannot inflate the
    threshold and mask each other — the robust-statistics companion.

    Two percentile aggregates (median, then MAD) — each is a tiny
    per-group row broadcast back; the corpus passes stay map-side. Exact
    percentile buffers each group's values: right at oracle scale; at
    100 TB-per-type swap the two aggregates to ``approx_percentile``
    (KLL sketch, bounded memory) — the plan shape is unchanged.
    """
    e = _events(spark, sf).select("event_id", "event_type", "value")
    med = e.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    withmed = e.join(F.broadcast(med), "event_type")
    mad = withmed.groupBy("event_type").agg(
        F.percentile(F.abs(F.col("value") - F.col("med")), F.lit(0.5)).alias("mad")
    )
    score = round4(
        F.abs(F.col("value") - F.col("med"))
        / (F.lit(1.4826) * F.col("mad"))
    )
    return (
        withmed.join(F.broadcast(mad), "event_type")
        .where(F.col("mad") > F.lit(0.0))
        .select("event_id", "event_type", round4(F.col("value")).alias("value"),
                score.alias("score"))
        .where(F.col("score") > F.lit(3.0))
    )


ORACLES["mad_outliers"] = f"""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ), withmed AS (
      SELECT e.event_id, e.event_type, e.value, m.med
      FROM events e JOIN med m ON e.event_type = m.event_type
    ), mad AS (
      SELECT event_type, quantile_cont(abs(value - med), 0.5) AS mad
      FROM withmed GROUP BY event_type
    )
    SELECT event_id, w.event_type, {R("value")} AS value,
           {R("abs(value - med) / (CAST(1.4826 AS DOUBLE) * mad)")} AS score
    FROM withmed w JOIN mad d ON w.event_type = d.event_type
    WHERE d.mad > CAST(0.0 AS DOUBLE)
      AND {R("abs(value - med) / (CAST(1.4826 AS DOUBLE) * mad)")}
            > CAST(3.0 AS DOUBLE)
"""
QUERIES["mad_outliers"] = q_mad_outliers


def q_edit_distance_pairs(spark, sf):
    """Bounded-scope Levenshtein similarity pairs (40-char prefixes of the
    first 40 documents, distance <= 20): the exact-edit-distance oracle for
    the scale path — at corpus scale the deletion-neighborhood join
    (``operators/fuzzy.py``) generates candidates and exact Levenshtein
    verifies only those; this query pins the verifier's semantics
    cross-engine (insert/delete/substitute all cost 1 in both)."""
    d = (
        _t(spark, sf, "documents")
        .where(F.col("doc_id") < 40)
        .select(
            "doc_id",
            F.substring(F.lower(F.trim("text")), 1, 40).alias("s"),
        )
    )
    a, b = d.alias("a"), d.alias("b")
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.levenshtein(F.col("a.s"), F.col("b.s")).cast("int").alias("dist"),
        )
        .where(F.col("dist") <= 20)
    )


ORACLES["edit_distance_pairs"] = """
    WITH d AS (
      SELECT doc_id, substring(lower(trim(text)), 1, 40) AS s
      FROM documents WHERE doc_id < 40
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(levenshtein(a.s, b.s) AS INTEGER) AS dist
    FROM d a JOIN d b ON a.doc_id < b.doc_id
    WHERE levenshtein(a.s, b.s) <= 20
"""
QUERIES["edit_distance_pairs"] = q_edit_distance_pairs


def q_bpe_merge_candidates(spark, sf):
    """One BPE vocabulary-induction step: count adjacent symbol pairs
    across the corpus (weighted by word frequency — BPE's training
    statistic) and rank the top-20 merge candidates. The tokenizer-
    training companion to ``bpe_ish_token_count``'s APPLICATION of a
    merge table.

    Scale shape: word counts aggregate first (Zipf-compact relation), so
    the pair explode runs over distinct words x their lengths, not over
    every corpus token occurrence.

    Version-proof constructs (round-4 fix for the driver hash mismatch):
    any byte outside printable ASCII collapses to a space BEFORE the
    split (so Spark's Java regex and DuckDB's RE2 tokenize
    byte-identically regardless of their ``\\s``/Unicode class drift),
    the split itself is on literal space runs, and the top-20 tie-break
    orders by ``md5(pair)`` — hex output, immune to collation drift.
    """
    d = _t(spark, sf, "documents")
    s = F.regexp_replace(F.lower(F.trim(F.col("text"))), "[^ -~]", " ")
    words = (
        d.select(F.explode(F.split(s, " +")).alias("w"))
        .where(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pairs = (
        words.select(
            "n",
            F.explode(
                F.sequence(F.lit(1), F.length("w") - F.lit(1))
            ).alias("i"),
            "w",
        )
        .select(F.col("w").substr(F.col("i"), F.lit(2)).alias("pair"), "n")
        .groupBy("pair")
        .agg(F.sum("n").alias("cnt"))
    )
    from batch_processing_pipeline_spark.operators.rank import global_topk

    tie = F.md5(F.encode(F.col("pair"), "UTF-8"))
    # pair-vocabulary-sized input -> two-phase global top-k (round 9)
    return global_topk(
        pairs, [F.desc("cnt"), tie.asc()], k=20, rank_col="rk"
    ).select(F.col("rk").cast("int").alias("rk"), "pair", "cnt")


ORACLES["bpe_merge_candidates"] = r"""
    WITH words AS (
      SELECT w, COUNT(*) AS n FROM (
        SELECT unnest(string_split_regex(
          regexp_replace(lower(trim(text)), '[^ -~]', ' ', 'g'), ' +')) AS w
        FROM documents
      ) WHERE length(w) >= 2 GROUP BY w
    ), pairs AS (
      SELECT substring(w, CAST(i AS INTEGER), 2) AS pair, n
      FROM (SELECT w, n, unnest(range(1, length(w))) AS i FROM words)
    ), counts AS (
      SELECT pair, CAST(SUM(n) AS BIGINT) AS cnt FROM pairs GROUP BY pair
    )
    SELECT CAST(rk AS INTEGER) AS rk, pair, cnt FROM (
      SELECT pair, cnt,
             ROW_NUMBER() OVER (ORDER BY cnt DESC, md5(pair) ASC) AS rk
      FROM counts
    ) WHERE rk <= 20
"""
QUERIES["bpe_merge_candidates"] = q_bpe_merge_candidates


def q_pandas_grouped_agg(spark, sf):
    """Arrow-batched grouped-aggregate pandas UDF: per-event-type geometric
    mean of (1 + |value|). Demonstrates the GROUPED_AGG Arrow path — the
    escape hatch for aggregations Spark lacks natively — on a bounded
    per-group payload; the oracle recomputes it as exp(avg(ln(x))).

    Scale note: a grouped-agg pandas UDF ships each group's column to ONE
    python worker (no partial aggregation) — correct tool for modest
    group cardinality x bounded group size; for billion-row groups,
    reformulate as exp(AVG(LN(x))) which partial-aggregates (that twin IS
    this oracle).
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def geo_mean(v: pd.Series) -> float:
        return float(np.exp(np.log1p(v.abs()).mean()))

    e = _events(spark, sf).select("event_type", "value")
    return e.groupBy("event_type").agg(
        round4(geo_mean("value")).alias("geo_mean")
    )


ORACLES["pandas_grouped_agg"] = f"""
    SELECT event_type,
           {R("exp(AVG(ln(CAST(1.0 AS DOUBLE) + abs(value))))")} AS geo_mean
    FROM events GROUP BY event_type
"""
QUERIES["pandas_grouped_agg"] = q_pandas_grouped_agg


def q_quality_lr_scores(spark, sf):
    """ML quality-classifier stage (functions/quality_model.py): train the
    seeded logistic regression to separate clean fixture text from a
    constructed corrupted twin (punctuation junk + stopword stripping — the
    same ground-truth scheme test_quality_model uses), then score the clean
    corpus. Declared rows-only: L-BFGS coefficient floats are
    engine-specific, so no SQL oracle exists; determinism and separability
    are pinned in tests instead."""
    from batch_processing_pipeline_spark.functions.quality_model import (
        score_quality,
        train_quality_lr,
    )

    d = _t(spark, sf, "documents").select("doc_id", "text")
    corrupted = d.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(
            F.regexp_replace("text", r"\b(the|a|of|and|in|to)\b", ""),
            F.lit(" !!! ### $$$ %%% &&& *** !!!"),
        ).alias("text"),
    )
    train = (
        d.withColumn("label", F.lit(0.0))
        .unionByName(corrupted.withColumn("label", F.lit(1.0)))
    )
    model = train_quality_lr(train, "label")
    return score_quality(model, d, keep_cols=("doc_id",)).select(
        "doc_id", (F.col("quality_prob") > 0.5).cast("int").alias("flag_noisy")
    )


ORACLES["quality_lr_scores"] = None
QUERIES["quality_lr_scores"] = q_quality_lr_scores


def q_incremental_agg(spark, sf):
    """Incremental-merge correctness, oracle-proven: split events into two
    'daily batches' (epoch-day parity), pre-aggregate each, merge with the
    generalized mergeable-aggregate state merge
    (operators/state_store.merge_aggregates: sum/min/max/last-writer-wins),
    and emit the merged state. The oracle computes the SAME aggregates in
    one pass over all events — any non-commutative/non-associative merge
    bug (the reference's H1 double-count class) breaks the match.
    """
    from batch_processing_pipeline_spark.operators.state_store import (
        merge_aggregates,
    )

    e = _events(spark, sf).select(
        "event_id", "event_type", "ts", "value",
        F.floor(F.unix_timestamp("ts") / F.lit(86400)).alias("_day"),
    )

    def batch_agg(df):
        w = Window.partitionBy("event_type").orderBy(
            F.desc("ts"), F.desc("event_id")
        )
        last = (
            df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("event_type", F.col("value").alias("last_value"), "ts", "event_id")
        )
        agg = df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(cents(F.col("value"))).alias("sv_c"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )
        return agg.join(last, "event_type")

    b1 = batch_agg(e.where(F.col("_day") % 2 == 0))
    b2 = batch_agg(e.where(F.col("_day") % 2 == 1))
    merged = merge_aggregates(
        b1,
        b2,
        keys=["event_type"],
        sums=("n", "sv_c"),
        mins=("mn",),
        maxs=("mx",),
        latest=("last_value",),
        ts_col="ts",
        id_col="event_id",
    )
    return merged.select(
        "event_type", "n",
        round4(F.col("sv_c") / F.lit(100.0)).alias("sv"),
        round4(F.col("mn")).alias("mn"), round4(F.col("mx")).alias("mx"),
        round4(F.col("last_value")).alias("last_value"),
    )


ORACLES["incremental_agg"] = f"""
    WITH last AS (
      SELECT event_type, value AS last_value FROM (
        SELECT event_type, value,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
      ) WHERE rn = 1
    )
    SELECT e.event_type, COUNT(*) AS n, {R(sql_sum_money('e.value'))} AS sv,
           {R("MIN(e.value)")} AS mn, {R("MAX(e.value)")} AS mx,
           {R("ANY_VALUE(l.last_value)")} AS last_value
    FROM events e JOIN last l ON e.event_type = l.event_type
    GROUP BY e.event_type
"""
QUERIES["incremental_agg"] = q_incremental_agg


def q_grouped_ols(spark, sf):
    """Per-group OLS trend slope via ``applyInPandas`` (GROUPED_MAP): fit
    value ~ days for each event type in a vectorized pandas kernel — the
    Arrow per-group escape hatch for model-fitting logic SQL can't
    express. The oracle recomputes the slope with ``regr_slope``, so the
    kernel's math is pinned to the closed form.

    Scale note: GROUPED_MAP ships each group through one python worker;
    event types are few and bounded here. For billion-row groups use the
    sufficient-statistics form (sum x, sum y, sum xy, sum x2 — a plain
    partial-aggregating groupBy) and finish the algebra on the tiny
    result; this query's oracle IS that algebra.
    """
    import numpy as np

    e = _events(spark, sf).select(
        "event_type",
        (F.unix_timestamp("ts").cast("double") / F.lit(86400.0)).alias("x"),
        "value",
    )

    def ols(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["x"].to_numpy(dtype=float)
        y = pdf["value"].to_numpy(dtype=float)
        xc = x - x.mean()
        yc = y - y.mean()
        denom = float((xc * xc).sum())
        slope = float((xc * yc).sum() / denom) if denom > 0.0 else 0.0
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "slope": [slope],
                "n": [len(pdf)],
            }
        )

    fitted = e.groupBy("event_type").applyInPandas(
        ols, "event_type string, slope double, n long"
    )
    return fitted.select("event_type", round4(F.col("slope")).alias("slope"), "n")


ORACLES["grouped_ols"] = f"""
    SELECT event_type,
           {R("regr_slope(value, CAST(floor(epoch(ts)) AS DOUBLE) / CAST(86400.0 AS DOUBLE))")}
               AS slope,
           COUNT(*) AS n
    FROM events GROUP BY event_type
"""
QUERIES["grouped_ols"] = q_grouped_ols


def q_udtf_ngrams(spark, sf):
    """Python UDTF surface (Spark 4 table functions): a lateral-joined
    word-trigram generator, aggregated to the top-25 trigrams. The
    DataFrame-native twin of this explode lives in ``top_bigrams``; this
    query pins the NEW API path (registered UDTF + LATERAL in SQL text)
    to the same arithmetic.

    Scale note: a Python UDTF is a row-at-a-time python boundary — fine
    as an API demo and for low-volume lateral expansion; corpus-scale
    n-gram passes use the codegen explode (word_ngram_counts).
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="ngram: string")
    class Trigrams:
        def eval(self, text: str):
            if text is None:
                return
            toks = [t for t in text.strip().lower().split() if t]
            for i in range(len(toks) - 2):
                yield (" ".join(toks[i : i + 3]),)

    spark.udtf.register("trigrams", Trigrams)
    _t(spark, sf, "documents").createOrReplaceTempView("_docs_udtf")
    counted = spark.sql(
        """
        SELECT t.ngram, COUNT(*) AS n
        FROM _docs_udtf d, LATERAL trigrams(d.text) t
        GROUP BY t.ngram
        """
    )
    from batch_processing_pipeline_spark.operators.rank import global_topk

    # trigram-vocabulary-sized input -> two-phase global top-k (round 9)
    return global_topk(
        counted, [F.desc("n"), F.asc("ngram")], k=25, rank_col="rk"
    ).select(F.col("rk").cast("int").alias("rk"), "ngram", "n")


ORACLES["udtf_ngrams"] = r"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\s+'),
                                 x -> length(x) > 0) AS t
      FROM documents
    ), tri AS (
      SELECT t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS ngram
      FROM (SELECT t, unnest(generate_series(1, len(t) - 2)) AS i
            FROM toks WHERE len(t) >= 3)
    ), counted AS (
      SELECT ngram, COUNT(*) AS n FROM tri GROUP BY ngram
    )
    SELECT CAST(rk AS INTEGER) AS rk, ngram, n FROM (
      SELECT ngram, n, ROW_NUMBER() OVER (ORDER BY n DESC, ngram ASC) AS rk
      FROM counted
    ) WHERE rk <= 25
"""
QUERIES["udtf_ngrams"] = q_udtf_ngrams


def q_cogrouped_asof(spark, sf):
    """Cogrouped ``applyInPandas`` surface: per-user as-of merge — for
    every purchase event, the most recent strictly-earlier click by the
    same user — with both sides shipped to one pandas kernel per key
    (``groupBy().cogroup()``). The DataFrame-native as-of join
    (operators/asof) is the scale path; the oracle is a correlated
    subquery, so the kernel's tie/boundary semantics are pinned.
    """
    e = _events(spark, sf).select(
        "user_id", "event_id", "event_type",
        F.unix_timestamp("ts").alias("ts_s"), "value",
    )
    purchases = e.where(F.col("event_type") == "purchase")
    # Both sides derive from the same plan; identical attribute names make
    # Spark's cogroup attribute-dedup collapse the right side's payload
    # columns (the pandas kernel then sees only the key). Rename the right
    # side's columns to keep them distinct.
    clicks = e.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"), F.col("ts_s").alias("c_ts_s")
    )

    def asof(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return pd.DataFrame(
                columns=["user_id", "event_id", "ts_s", "click_ts"]
            ).astype({"user_id": "int64", "event_id": "int64",
                      "ts_s": "int64", "click_ts": "float64"})
        l = left.sort_values(["ts_s", "event_id"]).reset_index(drop=True)
        rts = sorted(right["c_ts_s"].tolist()) if len(right) else []
        out_ts = []
        import bisect
        for t in l["ts_s"]:
            i = bisect.bisect_left(rts, t)  # strictly earlier
            out_ts.append(float(rts[i - 1]) if i > 0 else None)
        return pd.DataFrame(
            {
                "user_id": l["user_id"],
                "event_id": l["event_id"],
                "ts_s": l["ts_s"],
                "click_ts": out_ts,
            }
        )

    out = purchases.groupBy("user_id").cogroup(clicks.groupBy("c_user_id")).applyInPandas(
        asof, "user_id long, event_id long, ts_s long, click_ts double"
    )
    return out.select(
        "user_id", "event_id", "ts_s",
        F.col("click_ts").cast("long").alias("click_ts"),
    )


ORACLES["cogrouped_asof"] = """
    SELECT e.user_id, e.event_id,
           CAST(floor(epoch(e.ts)) AS BIGINT) AS ts_s,
           CAST((
             SELECT MAX(floor(epoch(c.ts))) FROM events c
             WHERE c.user_id = e.user_id AND c.event_type = 'click'
               AND floor(epoch(c.ts)) < floor(epoch(e.ts))
           ) AS BIGINT) AS click_ts
    FROM events e WHERE e.event_type = 'purchase'
"""
QUERIES["cogrouped_asof"] = q_cogrouped_asof


# =====================================================================
# Approximate-percentile twins (the 100 TB swap, exercised)
# =====================================================================
# Each exact-percentile query above (percentiles, equidepth_buckets,
# rfm_scores, mad_outliers) buffers per-group values in the aggregate —
# fine per-entity, wrong for per-event 100 TB data. These twins run the
# SAME plan shape with ``approx_percentile`` (a mergeable quantile
# sketch: bounded memory per partition, partial-agg before the
# exchange). Sketches are engine-specific, so the driver records a
# rows-only check; tests/test_sketches.py pins the error bound against
# the exact path at accuracy=10000 (observed rank error ≤ 1/accuracy).


def q_approx_percentiles(spark, sf):
    """``percentiles`` with the KLL-style approx sketch — bounded memory
    per (group, partition) instead of buffering every value."""
    l = _t(spark, sf, "lineitem")
    pct = F.approx_percentile("l_quantity", F.lit([0.25, 0.5, 0.9]), F.lit(10000))
    return l.groupBy("l_returnflag").agg(
        round4(F.element_at(pct, 1)).alias("p25"),
        round4(F.element_at(pct, 2)).alias("p50"),
        round4(F.element_at(pct, 3)).alias("p90"),
    )


ORACLES["approx_percentiles"] = None
QUERIES["approx_percentiles"] = q_approx_percentiles


def q_approx_equidepth_buckets(spark, sf):
    """``equidepth_buckets`` with sketched decile boundaries — the bucket
    assignment stays an exact map-side comparison sum; only the boundary
    aggregate swaps to the mergeable sketch."""
    li = _t(spark, sf, "lineitem")
    qs = [i / 10.0 for i in range(1, 10)]
    bounds = li.agg(
        *[
            F.approx_percentile("l_quantity", F.lit(q), F.lit(10000)).alias(f"_b{i}")
            for i, q in enumerate(qs)
        ]
    )
    bucketed = li.crossJoin(F.broadcast(bounds)).select(
        (
            F.lit(1)
            + sum(
                (
                    F.when(F.col("l_quantity") > F.col(f"_b{i}"), 1).otherwise(0)
                    for i in range(9)
                ),
                start=F.lit(0),
            )
        ).cast("int").alias("bucket"),
        "l_quantity",
    )
    return bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        round4(F.min("l_quantity")).alias("min_q"),
        round4(F.max("l_quantity")).alias("max_q"),
    )


ORACLES["approx_equidepth_buckets"] = None
QUERIES["approx_equidepth_buckets"] = q_approx_equidepth_buckets


def q_approx_rfm_scores(spark, sf):
    """``rfm_scores`` with sketched tercile boundaries — per-customer
    relations stay exact; only the 6-value boundary row is approximate.
    Monetary is exact integer cents, mirroring the exact query (the
    boundary-tie determinism argument applies identically)."""
    o = _t(spark, sf, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).cast("long").alias("freq"),
        F.sum(cents(F.col("o_totalprice"))).alias("monetary_c"),
    )
    anchor = o.agg(F.max("o_orderdate").alias("max_date"))
    rfm = per_cust.crossJoin(F.broadcast(anchor)).select(
        "o_custkey",
        F.datediff("max_date", "last_order").cast("long").alias("recency_days"),
        "freq",
        "monetary_c",
    )
    bounds = rfm.agg(
        *[
            F.approx_percentile(c, F.lit(q), F.lit(10000)).alias(f"_{c}{i}")
            for c in ("recency_days", "freq", "monetary_c")
            for i, q in ((1, 1 / 3), (2, 2 / 3))
        ]
    )

    def score(c):
        return (
            F.lit(1)
            + F.when(F.col(c) > F.col(f"_{c}1"), 1).otherwise(0)
            + F.when(F.col(c) > F.col(f"_{c}2"), 1).otherwise(0)
        ).cast("int")

    return rfm.crossJoin(F.broadcast(bounds)).select(
        "o_custkey",
        "recency_days",
        "freq",
        round4(F.col("monetary_c") / 100.0).alias("monetary"),
        (F.lit(4) - score("recency_days")).cast("int").alias("r_score"),
        score("freq").alias("f_score"),
        score("monetary_c").alias("m_score"),
    )


ORACLES["approx_rfm_scores"] = None
QUERIES["approx_rfm_scores"] = q_approx_rfm_scores


def q_approx_mad_outliers(spark, sf):
    """``mad_outliers`` with sketched median/MAD — the two per-group
    percentile aggregates swap to the sketch; the score math and the
    broadcast-back shape are identical to the exact path."""
    e = _events(spark, sf).select("event_id", "event_type", "value")
    med = e.groupBy("event_type").agg(
        F.approx_percentile("value", F.lit(0.5), F.lit(10000)).alias("med")
    )
    withmed = e.join(F.broadcast(med), "event_type")
    mad = withmed.groupBy("event_type").agg(
        F.approx_percentile(
            F.abs(F.col("value") - F.col("med")), F.lit(0.5), F.lit(10000)
        ).alias("mad")
    )
    score = round4(
        F.abs(F.col("value") - F.col("med")) / (F.lit(1.4826) * F.col("mad"))
    )
    return (
        withmed.join(F.broadcast(mad), "event_type")
        .where(F.col("mad") > F.lit(0.0))
        .select("event_id", "event_type", round4(F.col("value")).alias("value"),
                score.alias("score"))
        .where(F.col("score") > F.lit(3.0))
    )


ORACLES["approx_mad_outliers"] = None
QUERIES["approx_mad_outliers"] = q_approx_mad_outliers


