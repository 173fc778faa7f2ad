"""Registry section: forecasting, allocation, entity resolution, k-core, cohort/readability, file-format round-trips, eval metrics.

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
    normalize_queries,
    prefix_frequencies,
    round4,
    top_k_per_group,
    whitespace_token_count,
)
from batch_processing_pipeline_spark.registry.analytics import _SMB_CLEANUP_DIRS  # noqa: F401
from batch_processing_pipeline_spark.registry.curation import _SPLIT_WEIGHTS, hex_threshold  # noqa: F401

# ---------------------------------------------------------- round-5 additions
def q_holt_forecast(spark, sf):
    """Holt linear-trend exponential smoothing over the daily event-count
    series, with h-step-ahead forecasts — the classic capacity-planning
    smoother (level + trend recurrences l_t = a*x_t + (1-a)(l+b),
    b_t = g*(l_t - l) + (1-g)*b).

    The recurrence is inherently sequential, so it runs as ONE
    ``F.aggregate`` fold over the ordered day array — the H4
    ordered-collect discipline bounds the array at series length (30 rows
    here, ~36.5k for a century), never fact size: the 100-TB cost is the
    per-day count, a plain partial-aggregated groupBy. The DuckDB oracle
    replays the identical recurrence as a recursive CTE, so the fold's
    operation ORDER is pinned cross-engine (same literals, same
    association), not just its final rounding.
    """
    alpha, gamma = 0.5, 0.3
    e = _events(spark, sf)
    daily = e.groupBy(
        F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("d")
    ).agg(F.count(F.lit(1)).cast("double").alias("x"))
    series = daily.agg(
        F.array_sort(F.collect_list(F.struct("d", "x"))).alias("s")
    )

    def step(acc, p):
        lvl = (
            F.lit(alpha) * p["x"]
            + F.lit(1.0 - alpha) * (acc["l"] + acc["b"])
        )
        return F.struct(
            lvl.alias("l"),
            (
                F.lit(gamma) * (lvl - acc["l"]) + F.lit(1.0 - gamma) * acc["b"]
            ).alias("b"),
        )

    folded = series.select(
        F.size("s").cast("long").alias("n_days"),
        F.aggregate(
            F.slice("s", 2, F.size("s") - 1),
            F.struct(
                F.col("s")[0]["x"].alias("l"), F.lit(0.0).alias("b")
            ),
            step,
        ).alias("hb"),
    )
    return folded.select(
        "n_days",
        round4(F.col("hb")["l"]).alias("level"),
        round4(F.col("hb")["b"]).alias("trend"),
        round4(F.col("hb")["l"] + F.col("hb")["b"]).alias("f1"),
        round4(F.col("hb")["l"] + 7.0 * F.col("hb")["b"]).alias("f7"),
    )


ORACLES["holt_forecast"] = f"""
    WITH RECURSIVE daily AS (
      SELECT CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS d,
             CAST(COUNT(*) AS DOUBLE) AS x
      FROM events GROUP BY 1
    ), idx AS (
      SELECT x, ROW_NUMBER() OVER (ORDER BY d) AS i FROM daily
    ), holt(i, l, b) AS (
      -- CAST the seed: a bare 0.0 types the recursion's column DECIMAL(2,1)
      -- and silently truncates every iteration
      SELECT CAST(1 AS BIGINT), x, CAST(0.0 AS DOUBLE) FROM idx WHERE i = 1
      UNION ALL
      SELECT idx.i,
             0.5 * idx.x + 0.5 * (h.l + h.b),
             0.3 * ((0.5 * idx.x + 0.5 * (h.l + h.b)) - h.l) + 0.7 * h.b
      FROM holt h JOIN idx ON idx.i = h.i + 1
    ), last AS (SELECT MAX(i) AS n FROM idx)
    SELECT CAST(last.n AS BIGINT) AS n_days,
           {R("h.l")} AS level,
           {R("h.b")} AS trend,
           {R("h.l + h.b")} AS f1,
           {R("h.l + 7.0 * h.b")} AS f7
    FROM holt h, last WHERE h.i = last.n
"""
QUERIES["holt_forecast"] = q_holt_forecast


def q_unimax_alloc(spark, sf):
    """UniMax language-sampling allocation (Chung et al. 2023, "UniMax:
    Fairer and More Effective Language Sampling for Large-Scale
    Multilingual Pretraining"): give every language up to ``c`` epochs of
    its corpus, splitting the remaining token budget uniformly — the
    capped water-filling alloc_l = min(c*N_l, s) where s solves
    sum(min(c*N_l, s)) = B.

    The threshold search is NOT an iterative loop: with languages sorted
    by cap ascending, language k is capped iff giving its cap to every
    remaining language still fits the leftover budget
    (cap_k * (n-k+1) <= B - prefix_{{k-1}}), so one cumulative window over
    the LANGUAGE relation (dimension-sized — a few hundred rows even for
    a full web crawl) finds the split point and the closed-form s. The
    fact-table cost is one partial-aggregated token count per language.
    """
    c_epochs = 4.0
    budget_frac = 2.0  # B = 2x the corpus: forces a nontrivial split
    d = _t(spark, sf, "documents").where(F.length(F.trim(F.col("text"))) > 0)
    per_lang = d.groupBy("lang").agg(
        F.sum(whitespace_token_count(F.lower(F.trim(F.col("text")))))
        .cast("double")
        .alias("n_tokens")
    )
    w_all = Window.partitionBy()
    w_cum = Window.orderBy(
        (F.col("n_tokens") * c_epochs).asc(), F.col("lang").asc()
    ).rowsBetween(Window.unboundedPreceding, 0)
    ranked = per_lang.select(
        "lang",
        "n_tokens",
        (F.col("n_tokens") * F.lit(c_epochs)).alias("cap"),
        F.sum("n_tokens").over(w_all).alias("total"),
        F.count(F.lit(1)).over(w_all).alias("n_langs"),
        F.row_number()
        .over(Window.orderBy((F.col("n_tokens") * c_epochs).asc(), F.col("lang").asc()))
        .alias("k"),
        F.sum(F.col("n_tokens") * c_epochs).over(w_cum).alias("prefix"),
    )
    b = F.col("total") * F.lit(budget_frac)
    capped = (
        F.col("cap") * (F.col("n_langs") - F.col("k") + 1)
        <= b - (F.col("prefix") - F.col("cap"))
    ).cast("int")
    flagged = ranked.withColumn("capped", capped)
    w_tot = Window.partitionBy()
    solved = flagged.select(
        "lang",
        "n_tokens",
        "cap",
        "capped",
        b.alias("budget"),
        F.sum("capped").over(w_tot).alias("n_capped"),
        F.sum(F.col("cap") * F.col("capped")).over(w_tot).alias("capped_sum"),
        F.col("n_langs"),
    )
    s = (F.col("budget") - F.col("capped_sum")) / (
        F.col("n_langs") - F.col("n_capped")
    )
    alloc = F.when(F.col("capped") == 1, F.col("cap")).otherwise(s)
    return solved.select(
        "lang",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        round4(F.col("cap")).alias("cap_tokens"),
        round4(alloc).alias("alloc_tokens"),
        round4(alloc / F.col("n_tokens")).alias("epochs"),
    )


ORACLES["unimax_alloc"] = f"""
    WITH per_lang AS (
      SELECT lang,
             CAST(SUM(len(regexp_split_to_array(lower(trim(text)), '\\s+')))
                  AS DOUBLE) AS n_tokens
      FROM documents WHERE length(trim(text)) > 0
      GROUP BY lang
    ), ranked AS (
      SELECT lang, n_tokens, n_tokens * 4.0 AS cap,
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
      SELECT lang, n_tokens, cap, capped, budget, n_langs,
             SUM(capped) OVER () AS n_capped,
             SUM(cap * capped) OVER () AS capped_sum
      FROM flagged
    )
    SELECT lang,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           {R("cap")} AS cap_tokens,
           {R("CASE WHEN capped = 1 THEN cap ELSE "
              "(budget - capped_sum) / (n_langs - n_capped) END")}
             AS alloc_tokens,
           {R("CASE WHEN capped = 1 THEN cap ELSE "
              "(budget - capped_sum) / (n_langs - n_capped) END / n_tokens")}
             AS epochs
    FROM solved
"""
QUERIES["unimax_alloc"] = q_unimax_alloc


def q_geo_grid_hotspots(spark, sf):
    """Spatial grid aggregation + neighborhood density + haversine — the
    geo-bucketing pattern (grid cells are the LSH of space: all spatial
    predicates become equi-joins on cell keys, no geometry shuffle).

    Users get deterministic pseudo-coordinates (md5-derived, the
    operators/sampling.py portable-hash discipline — no RNG, identical in
    both engines) since the fixture has no geo columns; the *shape* under
    test is real: 1-degree cell keys via floor(), per-cell user/event
    rollup, a 3x3 neighbor-cell density via a 9-way offset equi-join
    (bounded fan-out, no cross join), and great-circle distance from each
    cell center to a reference point via the haversine formula. No
    antimeridian wrap at the demo grid; a production grid uses a
    hierarchical cell scheme (S2/H3) with the same equi-join shape.
    """
    e = _events(spark, sf)
    per_user = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_ev"))
    h = lambda seed: F.conv(
        F.substring(
            F.md5(F.concat(F.lit(seed), F.col("user_id").cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    pts = per_user.select(
        "user_id",
        "n_ev",
        (F.pmod(h("glat:"), F.lit(1_800_000)) / 10000.0 - 90.0).alias("lat"),
        (F.pmod(h("glon:"), F.lit(3_600_000)) / 10000.0 - 180.0).alias("lon"),
    )
    cells = pts.groupBy(
        F.floor("lat").cast("long").alias("clat"),
        F.floor("lon").cast("long").alias("clon"),
    ).agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("n_ev").alias("n_events"),
    )
    offsets = spark.range(0, 9).select(
        (F.col("id") % 3 - 1).cast("long").alias("dx"),
        (F.col("id") / 3).cast("long").alias("dy_raw"),
    ).select("dx", (F.col("dy_raw") - 1).alias("dy"))
    neigh = (
        cells.select(
            F.col("clat").alias("nlat"),
            F.col("clon").alias("nlon"),
            F.col("n_events").alias("ne"),
        )
        .crossJoin(F.broadcast(offsets))
        .select(
            (F.col("nlat") + F.col("dx")).alias("clat"),
            (F.col("nlon") + F.col("dy")).alias("clon"),
            "ne",
        )
        .groupBy("clat", "clon")
        .agg(F.sum("ne").alias("neigh_events"))
    )
    lat0, lon0 = 40.0, -74.0
    clat_c = F.col("clat") + 0.5
    clon_c = F.col("clon") + 0.5
    dphi = F.radians(clat_c - F.lit(lat0))
    dlmb = F.radians(clon_c - F.lit(lon0))
    a = (
        F.sin(dphi / 2) * F.sin(dphi / 2)
        + F.cos(F.radians(F.lit(lat0)))
        * F.cos(F.radians(clat_c))
        * F.sin(dlmb / 2)
        * F.sin(dlmb / 2)
    )
    km = 2.0 * 6371.0 * F.asin(F.sqrt(a))
    return (
        cells.join(neigh, ["clat", "clon"])
        .select(
            "clat",
            "clon",
            F.col("n_users").cast("long").alias("n_users"),
            F.col("n_events").cast("long").alias("n_events"),
            F.col("neigh_events").cast("long").alias("neigh_events"),
            round4(km).alias("ref_km"),
        )
    )


ORACLES["geo_grid_hotspots"] = f"""
    WITH per_user AS (
      SELECT user_id, COUNT(*) AS n_ev FROM events GROUP BY user_id
    ), pts AS (
      SELECT user_id, n_ev,
             CAST(CAST('0x' || substr(md5('glat:' || CAST(user_id AS VARCHAR)), 1, 8)
                  AS BIGINT) % 1800000 AS DOUBLE) / 10000.0 - 90.0 AS lat,
             CAST(CAST('0x' || substr(md5('glon:' || CAST(user_id AS VARCHAR)), 1, 8)
                  AS BIGINT) % 3600000 AS DOUBLE) / 10000.0 - 180.0 AS lon
      FROM per_user
    ), cells AS (
      SELECT CAST(FLOOR(lat) AS BIGINT) AS clat,
             CAST(FLOOR(lon) AS BIGINT) AS clon,
             CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(n_ev) AS BIGINT) AS n_events
      FROM pts GROUP BY 1, 2
    ), offsets AS (
      SELECT dx, dy FROM (SELECT UNNEST([-1, 0, 1]) AS dx),
                         (SELECT UNNEST([-1, 0, 1]) AS dy)
    ), neigh AS (
      SELECT c.clat + o.dx AS clat, c.clon + o.dy AS clon,
             CAST(SUM(c.n_events) AS BIGINT) AS neigh_events
      FROM cells c CROSS JOIN offsets o
      GROUP BY 1, 2
    )
    SELECT c.clat, c.clon, c.n_users, c.n_events, n.neigh_events,
           {R("2.0 * 6371.0 * ASIN(SQRT("
              "SIN(RADIANS((c.clat + 0.5) - 40.0) / 2)"
              " * SIN(RADIANS((c.clat + 0.5) - 40.0) / 2)"
              " + COS(RADIANS(40.0)) * COS(RADIANS(c.clat + 0.5))"
              " * SIN(RADIANS((c.clon + 0.5) - (-74.0)) / 2)"
              " * SIN(RADIANS((c.clon + 0.5) - (-74.0)) / 2)))")} AS ref_km
    FROM cells c JOIN neigh n ON n.clat = c.clat AND n.clon = c.clon
"""
QUERIES["geo_grid_hotspots"] = q_geo_grid_hotspots


def q_entity_resolution(spark, sf):
    """Composed entity-resolution funnel: normalize -> deletion-neighborhood
    blocking -> bounded pairwise verification -> transitive closure ->
    survivorship, as ONE plan (the record-linkage twin of the pretrain
    funnel).

    Records are customers keyed by an md5-derived 8-hex display name (the
    fixture's sequential names are pathological for ER — every neighbor is
    edit-distance 1 — so the name channel is re-keyed through the portable
    hash discipline of operators/sampling.py); every third record is
    re-ingested as a "dirty" duplicate with one character corrupted at a
    key-derived position, the classic OCR/typo error model.

    Blocking is SymSpell-style deletion neighborhoods (Garbe's symmetric
    delete algorithm, public domain): each record emits its 8
    single-deletion variants, and records sharing a (position, variant)
    bucket become candidates — a plain equi-join on 7-char keys, never an
    all-pairs scan; for an edit-distance-1 error model the neighborhood is
    exhaustive (recall 1.0 by construction), and bucket sizes are bounded
    by hash uniformity (collision P ~ n^2 * 8 / 16^8). Verification runs
    levenshtein <= 1 ONLY on bucket collisions; closure is the
    pointer-doubling connected components of operators/components.py (the
    DuckDB oracle replays it as a recursive reachability CTE — candidate
    graphs are pair-dominated, so the CTE stays bounded); survivorship
    keeps the min-id record per entity with its member count.
    """
    c = _t(spark, sf, "customer").select("c_custkey")
    name = F.substring(
        F.md5(F.concat(F.lit("ent:"), F.col("c_custkey").cast("string"))), 1, 8
    )
    clean = c.select(F.col("c_custkey").alias("rid"), name.alias("name"))
    # corruption position derives from the ORIGINAL rid; 10^7 is a multiple
    # of 8, so the oracle's (rid + 10^7) % 8 lands on the same position
    dirty = (
        clean.where(F.col("rid") % 3 == 0)
        .select(
            (F.col("rid") + F.lit(10_000_000)).alias("rid"),
            F.concat(
                F.expr("substring(name, 1, (CAST(rid % 8 AS INT) + 1) - 1)"),
                F.lit("x"),
                F.expr("substring(name, (CAST(rid % 8 AS INT) + 1) + 1, 8)"),
            ).alias("name"),
        )
    )
    records = clean.unionByName(dirty)
    keys = records.select(
        "rid",
        "name",
        F.explode(F.sequence(F.lit(1), F.lit(8))).alias("p"),
    ).select(
        "rid",
        "name",
        "p",
        F.concat(
            F.expr("substring(name, 1, p - 1)"), F.expr("substring(name, p + 1, 8)")
        ).alias("bkey"),
    )
    a, b = keys.alias("a"), keys.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.p") == F.col("b.p"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.rid") < F.col("b.rid")),
        )
        .select(
            F.col("a.rid").alias("id_a"),
            F.col("b.rid").alias("id_b"),
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
        )
        .distinct()
    )
    edges = cand.where(F.levenshtein("name_a", "name_b") <= 1).select(
        "id_a", "id_b"
    )
    from batch_processing_pipeline_spark.operators.components import (
        connected_components,
    )

    comp = connected_components(edges)
    labeled = records.join(
        comp.withColumnRenamed("node", "rid"), "rid", "left"
    ).select(
        "rid", "name", F.coalesce("component", F.col("rid")).alias("entity_id")
    )
    canon = labeled.where(F.col("rid") == F.col("entity_id")).select(
        "entity_id", F.col("name").alias("canonical_name")
    )
    return (
        labeled.groupBy("entity_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_records"))
        .join(canon, "entity_id")
        .select("entity_id", "n_records", "canonical_name")
    )


ORACLES["entity_resolution"] = """
    WITH RECURSIVE clean AS (
      SELECT c_custkey AS rid,
             substr(md5('ent:' || CAST(c_custkey AS VARCHAR)), 1, 8) AS name
      FROM customer
    ), dirty AS (
      SELECT rid + 10000000 AS rid,
             substr(name, 1, (CAST((rid + 10000000) % 8 AS INTEGER) + 1) - 1)
               || 'x'
               || substr(name, (CAST((rid + 10000000) % 8 AS INTEGER) + 1) + 1, 8)
               AS name
      FROM clean WHERE rid % 3 = 0
    ), records AS (
      SELECT * FROM clean UNION ALL SELECT * FROM dirty
    ), keys AS (
      SELECT rid, name, CAST(p AS INTEGER) AS p,
             substr(name, 1, CAST(p AS INTEGER) - 1)
               || substr(name, CAST(p AS INTEGER) + 1, 8) AS bkey
      FROM records, UNNEST(range(1, 9)) AS u(p)
    ), cand AS (
      SELECT DISTINCT a.rid AS id_a, b.rid AS id_b,
             a.name AS name_a, b.name AS name_b
      FROM keys a JOIN keys b
        ON a.p = b.p AND a.bkey = b.bkey AND a.rid < b.rid
    ), edges AS (
      SELECT id_a, id_b FROM cand WHERE levenshtein(name_a, name_b) <= 1
    ), sym AS (
      SELECT id_a AS u, id_b AS v FROM edges
      UNION SELECT id_b, id_a FROM edges
    ), reach(src, dst) AS (
      SELECT rid, rid FROM records
      UNION
      SELECT r.src, s.v FROM reach r JOIN sym s ON s.u = r.dst
    ), labeled AS (
      SELECT rec.rid, rec.name, cc.entity_id
      FROM records rec JOIN (
        SELECT src AS rid, MIN(dst) AS entity_id FROM reach GROUP BY src
      ) cc ON cc.rid = rec.rid
    )
    SELECT l.entity_id, CAST(COUNT(*) AS BIGINT) AS n_records,
           c.canonical_name
    FROM labeled l
    JOIN (SELECT rid AS entity_id, name AS canonical_name FROM records) c
      ON c.entity_id = l.entity_id
    GROUP BY l.entity_id, c.canonical_name
"""
QUERIES["entity_resolution"] = q_entity_resolution


def q_mm_audio(spark, sf):
    """REAL audio frame analysis: synthesize an 8-bit mono PCM WAV per
    document (stdlib RIFF/WAVE encoder; sample count and sawtooth step
    derived from text length), decode it inside mapInPandas, frame at 16
    samples, and emit RMS energy + zero-crossing counts — the audio twin
    of ``mm_frames``'s GIF path. The oracle regenerates the sawtooth
    arithmetically, so any chunk-walk/PCM/framing/feature bug breaks the
    match."""
    from batch_processing_pipeline_spark.multimodal.binary_ops import (
        audio_frame_features,
        synthesize_wav,
    )

    d = _t(spark, sf, "documents").select("doc_id", "text")
    feats = audio_frame_features(synthesize_wav(d), frame_len=16)
    return feats.select(
        "doc_id",
        "frame_idx",
        "n_samples",
        "sum_amp",
        round4(F.col("rms")).alias("rms"),
        "zero_cross",
    )


ORACLES["mm_audio"] = f"""
    WITH base AS (
      SELECT doc_id, length(COALESCE(text, '')) AS L FROM documents
    ), par AS (
      SELECT doc_id, L % 50 + 20 AS n, L % 7 + 2 AS step FROM base
    ), samp AS (
      SELECT doc_id,
             CAST(i // 16 AS INTEGER) AS frame_idx,
             CAST(i % 16 AS BIGINT) AS j,
             CAST((i * step) % 256 AS DOUBLE) AS v,
             CAST(((i + 1) * step) % 256 AS DOUBLE) AS v2
      FROM par, UNNEST(range(0, (n // 16) * 16)) AS u(i)
    )
    SELECT doc_id,
           frame_idx,
           CAST(COUNT(*) AS BIGINT) AS n_samples,
           CAST(SUM(v) AS BIGINT) AS sum_amp,
           {R("SQRT(SUM((v - 128.0) * (v - 128.0)) / 16.0)")} AS rms,
           CAST(SUM(CASE WHEN j < 15 AND ((v < 128.0) <> (v2 < 128.0))
                         THEN 1 ELSE 0 END) AS BIGINT) AS zero_cross
    FROM samp GROUP BY doc_id, frame_idx
"""
QUERIES["mm_audio"] = q_mm_audio


def q_vocab_coverage(spark, sf):
    """Good-Turing unseen-mass estimate + bias-corrected Chao1 vocabulary
    richness over the corpus — the standard "how much vocabulary has this
    crawl NOT seen yet" audit before committing to a tokenizer (singleton
    mass n1/N is the Good-Turing probability of a novel type; Chao1
    V + n1(n1-1)/(2(n2+1)) lower-bounds the true vocabulary).

    Two partial-aggregated groupBys (word counts, then
    frequency-of-frequency counts) and a 1-row reduce — nothing but
    (word, count) pairs ever shuffles. Tokenization is the portable
    single-space split (the zipf_fit discipline)."""
    d = _t(spark, sf, "documents")
    words = d.select(F.explode(F.split("text", " ", -1)).alias("w")).where(
        F.col("w") != ""
    )
    freq = words.groupBy("w").agg(F.count(F.lit(1)).alias("n"))
    agg = freq.agg(
        F.sum("n").cast("double").alias("n_tok"),
        F.count(F.lit(1)).cast("double").alias("v"),
        F.sum(F.when(F.col("n") == 1, 1).otherwise(0)).cast("double").alias("n1"),
        F.sum(F.when(F.col("n") == 2, 1).otherwise(0)).cast("double").alias("n2"),
    )
    return agg.select(
        F.col("n_tok").cast("long").alias("n_tokens"),
        F.col("v").cast("long").alias("vocab"),
        F.col("n1").cast("long").alias("n_singletons"),
        F.col("n2").cast("long").alias("n_doubletons"),
        round4(F.col("n1") / F.col("n_tok")).alias("p_unseen"),
        round4(
            F.col("v")
            + F.col("n1") * (F.col("n1") - 1.0) / (2.0 * (F.col("n2") + 1.0))
        ).alias("chao1_vocab"),
    )


ORACLES["vocab_coverage"] = f"""
    WITH words AS (
      SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ), freq AS (
      SELECT w, COUNT(*) AS n FROM words WHERE w <> '' GROUP BY w
    ), agg AS (
      SELECT CAST(SUM(n) AS DOUBLE) AS n_tok,
             CAST(COUNT(*) AS DOUBLE) AS v,
             CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS n1,
             CAST(SUM(CASE WHEN n = 2 THEN 1 ELSE 0 END) AS DOUBLE) AS n2
      FROM freq
    )
    SELECT CAST(n_tok AS BIGINT) AS n_tokens,
           CAST(v AS BIGINT) AS vocab,
           CAST(n1 AS BIGINT) AS n_singletons,
           CAST(n2 AS BIGINT) AS n_doubletons,
           {R("n1 / n_tok")} AS p_unseen,
           {R("v + n1 * (n1 - 1.0) / (2.0 * (n2 + 1.0))")} AS chao1_vocab
    FROM agg
"""
QUERIES["vocab_coverage"] = q_vocab_coverage


def q_term_burstiness(spark, sf):
    """Term burstiness (variance-to-mean ratio of per-document counts,
    zeros included): bursty terms (VMR >> 1) concentrate in few documents
    — topical or boilerplate — while VMR ~ 1 is Poisson background; a
    standard dispersion screen that catches template terms the df/cf
    ratios miss.

    The zero rows are never materialized: with per-doc counts c over D
    docs, sum((c - cf/D)^2) over ALL docs = sum(c^2) - cf^2/D, so the
    whole statistic folds into the (word, doc) partial aggregation plus a
    scalar doc count. Output bounded by the cf >= 20 support cut."""
    d = _t(spark, sf, "documents")
    n_docs = d.where(F.length(F.trim(F.col("text"))) > 0).count()
    per_doc = (
        d.select(
            "doc_id", F.explode(F.split("text", " ", -1)).alias("w")
        )
        .where(F.col("w") != "")
        .groupBy("w", "doc_id")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    per_word = per_doc.groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("c").alias("cf"),
        F.sum(F.col("c") * F.col("c")).alias("c2"),
    )
    mean = F.col("cf") / F.lit(float(n_docs))
    var = (F.col("c2") - F.col("cf") * F.col("cf") / F.lit(float(n_docs))) / F.lit(
        float(n_docs)
    )
    return (
        per_word.where(F.col("cf") >= 20)
        .select(
            F.col("w").alias("word"),
            "df",
            F.col("cf").cast("long").alias("cf"),
            round4(var / mean).alias("vmr"),
        )
    )


ORACLES["term_burstiness"] = f"""
    WITH nd AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS d
      FROM documents WHERE length(trim(text)) > 0
    ), per_doc AS (
      SELECT w, doc_id, CAST(COUNT(*) AS DOUBLE) AS c FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
      ) WHERE w <> '' GROUP BY w, doc_id
    ), per_word AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS df, SUM(c) AS cf,
             SUM(c * c) AS c2
      FROM per_doc GROUP BY w
    )
    SELECT w AS word, df, CAST(cf AS BIGINT) AS cf,
           {R("((c2 - cf * cf / nd.d) / nd.d) / (cf / nd.d)")} AS vmr
    FROM per_word, nd
    WHERE cf >= 20
"""
QUERIES["term_burstiness"] = q_term_burstiness


def q_stl_decompose(spark, sf):
    """Seasonal-trend decomposition of the daily event-count series
    (moving-average STL: trend = centered 7-day mean, seasonal = per-
    day-of-week mean of the detrended series, remainder = the rest) — the
    classic pre-anomaly-detection split.

    Exact-arithmetic discipline: the detrended value is carried as the
    INTEGER 7*x - sum7 (counts are exact in double), so every aggregation
    is order-independent and the only inexact steps are final divisions
    in a fixed expression order — the per-dow mean cannot drift with
    partial-aggregation order between engines. All windows run over the
    dimension-sized daily relation."""
    e = _events(spark, sf)
    daily = e.groupBy(
        F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("d")
    ).agg(F.count(F.lit(1)).cast("double").alias("x"))
    w7 = Window.orderBy("d").rowsBetween(-3, 3)
    t = daily.select(
        "d",
        "x",
        F.sum("x").over(w7).alias("s7"),
        F.count(F.lit(1)).over(w7).alias("c7"),
    ).select(
        "d",
        "x",
        F.when(F.col("c7") == 7, F.col("s7")).alias("s7"),
        (7.0 * F.col("x") - F.col("s7")).alias("detr7"),
        (F.col("d") % 7).alias("dow"),
    )
    w_dow = Window.partitionBy("dow")
    out = t.select(
        "d",
        "x",
        "s7",
        "dow",
        F.sum(F.when(F.col("s7").isNotNull(), F.col("detr7"))).over(w_dow).alias("sd"),
        F.count(F.when(F.col("s7").isNotNull(), 1)).over(w_dow).alias("nd"),
    )
    trend = F.col("s7") / 7.0
    # nd = 0 guard (a dow with no interior days on a sub-8-day corpus):
    # Spark non-ANSI division yields NULL while DuckDB yields NaN — make
    # the degenerate case NULL in both engines
    seasonal = F.when(
        F.col("nd") > 0, F.col("sd") / (7.0 * F.col("nd"))
    )
    return out.select(
        F.col("d").cast("long").alias("day_num"),
        F.col("x").cast("long").alias("n_events"),
        round4(trend).alias("trend"),
        round4(seasonal).alias("seasonal"),
        round4(F.col("x") - trend - seasonal).alias("remainder"),
    )


ORACLES["stl_decompose"] = f"""
    WITH daily AS (
      SELECT CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS d,
             CAST(COUNT(*) AS DOUBLE) AS x
      FROM events GROUP BY 1
    ), t AS (
      SELECT d, x,
             CASE WHEN COUNT(*) OVER w = 7
                  THEN SUM(x) OVER w END AS s7,
             d % 7 AS dow
      FROM daily
      WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ), t2 AS (
      SELECT d, x, s7, dow, 7.0 * x - s7 AS detr7 FROM t
    ), out AS (
      SELECT d, x, s7, dow,
             SUM(CASE WHEN s7 IS NOT NULL THEN detr7 END)
               OVER (PARTITION BY dow) AS sd,
             COUNT(CASE WHEN s7 IS NOT NULL THEN 1 END)
               OVER (PARTITION BY dow) AS nd
      FROM t2
    )
    SELECT CAST(d AS BIGINT) AS day_num,
           CAST(x AS BIGINT) AS n_events,
           {R("s7 / 7.0")} AS trend,
           {R("CASE WHEN nd > 0 THEN sd / (7.0 * nd) END")} AS seasonal,
           {R("CASE WHEN nd > 0 THEN x - s7 / 7.0 - sd / (7.0 * nd) END")}
             AS remainder
    FROM out
"""
QUERIES["stl_decompose"] = q_stl_decompose


def q_rolling_dau(spark, sf):
    """7-day rolling distinct active users per day (the DAU/WAU family).

    Window COUNT(DISTINCT) doesn't exist in either engine, and the naive
    per-day reaggregation rescans the fact table 7x. The scale shape:
    dedup to (user, active_day) once, explode each active day into the <=7
    future report days it contributes to, dedup (user, report_day), count
    — a fixed 7x amplification of the already-collapsed user-day relation,
    never of raw events, and every step is a partial-aggregated groupBy.
    Report days are clamped to the observed range so trailing windows
    don't invent empty days."""
    e = _events(spark, sf)
    user_days = e.select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("d"),
    ).distinct()
    max_day = user_days.agg(F.max("d").alias("m"))
    contrib = (
        user_days.crossJoin(F.broadcast(max_day))
        .select(
            "user_id",
            F.explode(
                F.sequence(F.col("d"), F.least(F.col("d") + 6, F.col("m")))
            ).alias("report_day"),
        )
        .distinct()
    )
    return (
        contrib.groupBy("report_day")
        .agg(F.countDistinct("user_id").alias("wau"))
        .select(F.col("report_day").cast("long").alias("report_day"), "wau")
    )


ORACLES["rolling_dau"] = """
    WITH user_days AS (
      SELECT DISTINCT user_id,
             CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS d
      FROM events
    ), mx AS (
      SELECT MAX(d) AS m FROM user_days
    ), contrib AS (
      SELECT DISTINCT user_id, d + off AS report_day
      FROM user_days, mx, UNNEST(range(0, 7)) AS u(off)
      WHERE d + off <= mx.m
    )
    SELECT report_day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
    FROM contrib GROUP BY report_day
"""
QUERIES["rolling_dau"] = q_rolling_dau


def q_attribution(spark, sf):
    """Last-touch conversion attribution: every purchase credits the most
    recent click by the same user within a 3-day lookback (ties broken by
    event_id — the determinism contract), then credit aggregates per
    attributed day. The marketing twin of the as-of join: a range
    predicate narrowed to an equi-join on user plus a bounded window.

    Scale shape: clicks and purchases partition on user_id (one shuffle
    each); the per-user range join's fan-out is bounded by the lookback;
    max_by picks the winning touch without a window sort."""
    e = _events(spark, sf)
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_id"),
        F.col("value").alias("revenue"),
    )
    joined = purchases.join(clicks, "user_id").where(
        (F.col("click_ts") <= F.col("p_ts"))
        & (F.col("click_ts") >= F.col("p_ts") - F.expr("INTERVAL 3 DAYS"))
    )
    won = joined.groupBy("p_id", "p_ts", "revenue").agg(
        F.max_by(
            F.struct("click_ts", "click_id"),
            F.struct("click_ts", "click_id"),
        ).alias("touch")
    )
    return (
        won.select(
            F.to_date(F.col("touch")["click_ts"]).alias("touch_day"),
            "revenue",
        )
        .groupBy("touch_day")
        .agg(
            F.count(F.lit(1)).alias("n_conversions"),
            round4(sum_money(F.col("revenue"))).alias("attributed_revenue"),
        )
        .select(
            F.date_format("touch_day", "yyyy-MM-dd").alias("touch_day"),
            "n_conversions",
            "attributed_revenue",
        )
    )


ORACLES["attribution"] = f"""
    WITH clicks AS (
      SELECT user_id, ts AS click_ts, event_id AS click_id
      FROM events WHERE event_type = 'click'
    ), purchases AS (
      SELECT user_id, ts AS p_ts, event_id AS p_id, value AS revenue
      FROM events WHERE event_type = 'purchase'
    ), joined AS (
      SELECT p.p_id, p.revenue, c.click_ts, c.click_id,
             ROW_NUMBER() OVER (PARTITION BY p.p_id
               ORDER BY c.click_ts DESC, c.click_id DESC) AS rk
      FROM purchases p JOIN clicks c ON c.user_id = p.user_id
      WHERE c.click_ts <= p.p_ts
        AND c.click_ts >= p.p_ts - INTERVAL 3 DAY
    )
    SELECT strftime(CAST(click_ts AS DATE), '%Y-%m-%d') AS touch_day,
           CAST(COUNT(*) AS BIGINT) AS n_conversions,
           {R(sql_sum_money('revenue'))} AS attributed_revenue
    FROM joined WHERE rk = 1
    GROUP BY 1
"""
QUERIES["attribution"] = q_attribution


def q_k_core(spark, sf):
    """k-core decomposition (k=2) of the co-purchase part graph: the
    maximal subgraph where every node keeps >= k neighbors — the standard
    "dense backbone" extraction before community detection, and the
    iterative-PEEL pattern (contrast with the pointer-doubling closure):
    each round drops nodes whose CURRENT degree is below k, which can
    cascade.

    Driver-looped with a convergence check and per-round localCheckpoint
    (the components.py discipline); each round is one degree aggregation
    + two semi-joins on the shrinking edge relation, so the 100-TB cost
    decays with the peel. Output is the surviving node set with its final
    in-core degree. The fixpoint is unique (the k-core is order-
    independent) and the peel is idempotent past it, so the oracle
    unrolls exactly this loop's 30-round cap as chained MATERIALIZED
    CTEs (``_k_core_oracle`` below) — extra rounds are no-ops, and both
    sides agree whenever this side converges (it raises otherwise);
    pytest additionally pins the result against a brute-force peel.
    """
    li = (
        _t(spark, sf, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .distinct()
    )
    k = 2
    # the checkpoint is edges' ONLY consumer — the round-12 fifth session
    # dropped a persist() here that was written during the checkpoint job
    # and never read again
    cur = edges.localCheckpoint(eager=True)
    n_cur = cur.count()
    converged = False
    # 30 removal rounds + 1 confirming pass: a peel whose last removal
    # lands exactly on round 30 must still get the stability-confirming
    # iteration before the cap raises (ADVICE r6)
    for _ in range(31):
        deg = (
            cur.select(F.col("u").alias("n"))
            .unionByName(cur.select(F.col("v").alias("n")))
            .groupBy("n")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        keep = deg.where(F.col("deg") >= k).select("n").persist()
        nxt = (
            cur.join(keep.withColumnRenamed("n", "u"), "u", "left_semi")
            .join(keep.withColumnRenamed("n", "v"), "v", "left_semi")
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
        keep.unpersist()
        # carry the edge count between rounds: nxt's count is next
        # round's cur count, so the convergence check costs ONE count
        # job per round, not two (round 12 fifth session — the
        # dedup_clusters cheap-convergence discipline)
        n_nxt = nxt.count()
        cur = nxt
        if n_nxt == n_cur:
            converged = True
            break
        n_cur = n_nxt
    if not converged:
        # an unconverged peel is a supergraph of the true k-core — fail
        # loudly rather than emit a silently-wrong result (a long cascade
        # chain at larger SF can exceed the round cap)
        raise RuntimeError(
            "k_core: peel did not reach fixpoint in 30 removal rounds "
            "(+1 confirming pass)"
        )
    deg = (
        cur.select(F.col("u").alias("part"))
        .unionByName(cur.select(F.col("v").alias("part")))
        .groupBy("part")
        .agg(F.count(F.lit(1)).cast("long").alias("core_degree"))
    )
    return deg.select(F.col("part").cast("long").alias("part"), "core_degree")


def _k_core_oracle(rounds: int = 30, k: int = 2) -> str:
    """Unrolled peel as SQL: 30 chained MATERIALIZED CTE rounds.

    A recursive CTE cannot express the peel (aggregation over the
    recursive reference), but the peel is IDEMPOTENT past its fixpoint —
    extra rounds are no-ops — so unrolling exactly the Spark side's
    round cap (30 removal rounds; q_k_core raises if unconverged by
    then) yields the identical fixpoint whenever the Spark side returns
    at all. MATERIALIZED is load-bearing: inlined CTEs would expand the
    30-deep chain exponentially (each round references its predecessor
    three times). Post-fixpoint rounds cost one no-op degree pass each
    (~4 s total at sf0.1 in DuckDB).
    """
    parts = [
        "li AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)",
        "e0 AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v"
        " FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey"
        " AND a.l_partkey < b.l_partkey)",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"k{i} AS MATERIALIZED (SELECT n FROM (SELECT u AS n FROM e{i-1}"
            f" UNION ALL SELECT v FROM e{i-1}) GROUP BY n HAVING COUNT(*) >= {k})"
        )
        parts.append(
            f"e{i} AS MATERIALIZED (SELECT u, v FROM e{i-1}"
            f" WHERE u IN (SELECT n FROM k{i}) AND v IN (SELECT n FROM k{i}))"
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + "\nSELECT CAST(n AS BIGINT) AS part,"
        " CAST(COUNT(*) AS BIGINT) AS core_degree\n"
        f"FROM (SELECT u AS n FROM e{rounds} UNION ALL SELECT v FROM e{rounds})"
        " GROUP BY n"
    )


ORACLES["k_core"] = _k_core_oracle()
QUERIES["k_core"] = q_k_core


def q_cohort_ltv(spark, sf):
    """Cohort LTV curves: cumulative purchase revenue per user by cohort
    age — the revenue twin of the retention matrix (the payback-period
    readout). Revenue rolls up to (cohort, age) first, so the cumulative
    window runs over the dimension-sized cohort x age grid; cohort sizes
    come from one user-level aggregate, and the division is a broadcast
    join back. Ages with activity but no purchases still appear (zero
    revenue, via the retention-grid left join) so the curve is dense."""
    e = _events(spark, sf)
    # first feeds THREE consumers (cohort sizes, the activity join, the
    # revenue join) — without a pin the full-events user aggregation
    # re-runs once per consumer (round 12 fifth session, guide §3.3).
    # The pin is (user_id, cohort): 12 B per user at any scale.
    first = e.groupBy("user_id").agg(
        F.to_date(F.date_trunc("day", F.min("ts"))).alias("cohort")
    ).localCheckpoint(eager=True)
    sizes = first.groupBy("cohort").agg(
        F.countDistinct("user_id").alias("cohort_users")
    )
    act = (
        e.select("user_id", F.to_date("ts").alias("d"))
        .distinct()
        .join(first, "user_id")
        .select("cohort", F.datediff(F.col("d"), F.col("cohort")).alias("age"))
        .distinct()
    )
    rev = (
        e.where(F.col("event_type") == "purchase")
        .join(first, "user_id")
        .groupBy(
            "cohort",
            F.datediff(F.to_date("ts"), F.col("cohort")).alias("age"),
        )
        .agg(F.sum(cents(F.col("value"))).alias("rev_c"))
    )
    grid = act.join(rev, ["cohort", "age"], "left").select(
        "cohort",
        "age",
        F.coalesce("rev_c", F.lit(0).cast("long")).alias("rev_c"),
    )
    w_cum = (
        Window.partitionBy("cohort")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # cumulative sum over exact long cents (r12 sweep): the running
    # window re-associates float additions differently per engine
    cum = grid.select(
        "cohort", "age", F.sum("rev_c").over(w_cum).alias("cum_rev_c")
    )
    return (
        cum.join(F.broadcast(sizes), "cohort")
        .select(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort"),
            F.col("age").cast("long").alias("age"),
            F.col("cohort_users").cast("long").alias("cohort_users"),
            round4(F.col("cum_rev_c") / F.lit(100.0)).alias("cum_revenue"),
            round4(
                F.col("cum_rev_c")
                / (F.lit(100.0) * F.col("cohort_users"))
            ).alias("ltv_per_user"),
        )
    )


ORACLES["cohort_ltv"] = f"""
    WITH first AS (
      SELECT user_id, CAST(date_trunc('day', MIN(ts)) AS DATE) AS cohort
      FROM events GROUP BY 1
    ), sizes AS (
      SELECT cohort, COUNT(DISTINCT user_id) AS cohort_users
      FROM first GROUP BY 1
    ), act AS (
      SELECT DISTINCT f.cohort,
             date_diff('day', f.cohort, CAST(e.ts AS DATE)) AS age
      FROM events e JOIN first f ON f.user_id = e.user_id
    ), rev AS (
      SELECT f.cohort,
             date_diff('day', f.cohort, CAST(e.ts AS DATE)) AS age,
             SUM({sql_cents('e.value')}) AS rev_c
      FROM events e JOIN first f ON f.user_id = e.user_id
      WHERE e.event_type = 'purchase'
      GROUP BY 1, 2
    ), grid AS (
      SELECT a.cohort, a.age, COALESCE(r.rev_c, 0) AS rev_c
      FROM act a LEFT JOIN rev r ON r.cohort = a.cohort AND r.age = a.age
    ), cum AS (
      SELECT cohort, age,
             SUM(rev_c) OVER (PARTITION BY cohort ORDER BY age
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rev_c
      FROM grid
    )
    SELECT strftime(c.cohort, '%Y-%m-%d') AS cohort,
           CAST(c.age AS BIGINT) AS age,
           CAST(s.cohort_users AS BIGINT) AS cohort_users,
           {R("c.cum_rev_c / CAST(100.0 AS DOUBLE)")} AS cum_revenue,
           {R("c.cum_rev_c / (CAST(100.0 AS DOUBLE) * s.cohort_users)")} AS ltv_per_user
    FROM cum c JOIN sizes s ON s.cohort = c.cohort
"""
QUERIES["cohort_ltv"] = q_cohort_ltv


def q_readability(spark, sf):
    """Flesch reading-ease per language — the classic prose-difficulty
    quality signal (pretrain curation uses it to screen keyword-stuffed
    or machine-generated text). Portable heuristics only: sentences =
    [.!?]+ runs, words = whitespace runs, syllables = vowel GROUPS
    ([aeiouy]+ runs, the standard approximation) — all three are
    regexp_extract_all counts, identical in both engines; no UDF, no
    dictionary. Per-doc counts partial-aggregate per language."""
    d = _t(spark, sf, "documents").where(
        F.length(F.trim(F.col("text"))) > 0
    )
    t = F.lower(F.trim(F.col("text")))
    n_sent = F.greatest(
        F.size(F.regexp_extract_all(t, F.lit(r"[.!?]+"), 0)), F.lit(1)
    ).cast("double")
    n_word = F.greatest(
        F.size(F.regexp_extract_all(t, F.lit(r"[^\s]+"), 0)), F.lit(1)
    ).cast("double")
    n_syl = F.greatest(
        F.size(F.regexp_extract_all(t, F.lit(r"[aeiouy]+"), 0)), F.lit(1)
    ).cast("double")
    per_doc = d.select(
        "lang",
        n_sent.alias("s"),
        n_word.alias("w"),
        n_syl.alias("y"),
    )
    agg = per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("s").alias("ts"),
        F.sum("w").alias("tw"),
        F.sum("y").alias("ty"),
    )
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (F.col("tw") / F.col("ts"))
        - F.lit(84.6) * (F.col("ty") / F.col("tw"))
    )
    return agg.select(
        "lang",
        "n_docs",
        round4(F.col("tw") / F.col("ts")).alias("words_per_sentence"),
        round4(F.col("ty") / F.col("tw")).alias("syllables_per_word"),
        round4(flesch).alias("flesch"),
    )


ORACLES["readability"] = f"""
    WITH per_doc AS (
      SELECT lang,
             GREATEST(len(regexp_extract_all(lower(trim(text)), '[.!?]+')), 1) AS s,
             GREATEST(len(regexp_extract_all(lower(trim(text)), '[^\\s]+')), 1) AS w,
             GREATEST(len(regexp_extract_all(lower(trim(text)), '[aeiouy]+')), 1) AS y
      FROM documents WHERE length(trim(text)) > 0
    ), agg AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(s) AS DOUBLE) AS ts,
             CAST(SUM(w) AS DOUBLE) AS tw,
             CAST(SUM(y) AS DOUBLE) AS ty
      FROM per_doc GROUP BY lang
    )
    SELECT lang, n_docs,
           {R("tw / ts")} AS words_per_sentence,
           {R("ty / tw")} AS syllables_per_word,
           {R("206.835 - 1.015 * (tw / ts) - 84.6 * (ty / tw)")} AS flesch
    FROM agg
"""
QUERIES["readability"] = q_readability


def _roundtrip_store(spark, sf, kind: str) -> str:
    """Per-(app, sf) temp path for format round-trip stores, registered
    for atexit cleanup (the continuous_aggregate/smb_join discipline)."""
    import atexit
    import hashlib
    import os
    import re
    import shutil

    app = re.sub(r"[^A-Za-z0-9_]", "_", spark.sparkContext.applicationId)
    tag = f"{app}_{hashlib.md5(os.path.abspath(sf).encode()).hexdigest()[:8]}"
    store = f"/tmp/bpps_{kind}/{tag}"
    if store not in _SMB_CLEANUP_DIRS:
        _SMB_CLEANUP_DIRS.add(store)
        atexit.register(shutil.rmtree, store, ignore_errors=True)
    return store


def q_csv_roundtrip(spark, sf):
    """CSV sink + source round trip on the WORST text: documents whose
    bodies embed the delimiter, quotes, and (at scale) newlines. Written
    RFC-4180 style (quote doubling via escape='"', header) and read back
    with an explicit schema + multiLine — the only safe way to re-ingest
    quoted newlines. The query output is a per-language checksum relation
    (row count, char total, md5-prefix sum) computed from the RE-READ
    copy; the oracle computes the same from the original parquet, so ANY
    quoting/escaping/type-inference loss breaks the hash.

    Scale note: multiLine CSV is not splittable (a reader cannot seek
    into a quoted region) — files stay bounded by the writer's
    partitioning, which is the real-world mitigation; columnar formats
    remain the scale path (see orc_roundtrip)."""
    import os

    store = _roundtrip_store(spark, sf, "csv")
    d = _t(spark, sf, "documents").select("doc_id", "text", "lang")
    if not os.path.exists(os.path.join(store, "_SUCCESS")):
        (
            d.write.mode("overwrite")
            .option("header", True)
            .option("escape", '"')
            .csv(store)
        )
    back = (
        spark.read.schema("doc_id long, text string, lang string")
        .option("header", True)
        .option("escape", '"')
        .option("multiLine", True)
        .csv(store)
    )
    # explicit concat + coalesce (NOT concat_ws, which SKIPS nulls while
    # the oracle's || would null out — a silent checksum divergence on
    # null text)
    ck = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit("\x01"),
                    F.coalesce("text", F.lit("")),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length(F.coalesce("text", F.lit("")))).alias("total_chars"),
        F.sum(ck).alias("checksum"),
    )


ORACLES["csv_roundtrip"] = """
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(length(COALESCE(text, ''))) AS BIGINT) AS total_chars,
           CAST(SUM(CAST('0x' || substr(
                 md5(CAST(doc_id AS VARCHAR) || chr(1) || COALESCE(text, '')),
                 1, 8)
               AS BIGINT)) AS BIGINT) AS checksum
    FROM documents GROUP BY lang
"""
QUERIES["csv_roundtrip"] = q_csv_roundtrip


def q_orc_roundtrip(spark, sf):
    """ORC sink + source round trip (the second columnar format a Spark
    shop runs beside parquet): orders written to ORC, re-read, and rolled
    up per status — counts, price total, and the date span as strings.
    The oracle computes the identical rollup from the original parquet,
    so the pinned contract is losslessness of the columnar round trip
    (types, nulls, date encoding). ORC stays splittable and
    predicate-pushdown-capable at scale, unlike the CSV path."""
    import os

    store = _roundtrip_store(spark, sf, "orc")
    o = _t(spark, sf, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )
    if not os.path.exists(os.path.join(store, "_SUCCESS")):
        o.write.mode("overwrite").orc(store)
    back = spark.read.orc(store)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        round4(sum_money(F.col("o_totalprice"))).alias("total_price"),
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("first_date"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("last_date"),
    )


ORACLES["orc_roundtrip"] = f"""
    SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
           {R(sql_sum_money('o_totalprice'))} AS total_price,
           strftime(CAST(MIN(o_orderdate) AS DATE), '%Y-%m-%d') AS first_date,
           strftime(CAST(MAX(o_orderdate) AS DATE), '%Y-%m-%d') AS last_date
    FROM orders GROUP BY o_orderstatus
"""
QUERIES["orc_roundtrip"] = q_orc_roundtrip


def q_suggest_mrr(spark, sf):
    """Ranking-quality readout for the flagship autocomplete pipeline:
    MRR and hit@k of the top-3 suggestion table against a deterministic
    per-prefix "clicked" query (min-md5 over the prefix's full candidate
    set — the portable pseudo-relevance-judgment discipline). This is the
    offline eval every suggestion service runs: if a ranking change
    regresses MRR, this query moves.

    The suggestion side IS the dq28 plan (normalize -> prefix fan-out ->
    frequency -> deterministic top-K); the judgment side is one more
    window over the same frequency relation; the final join is
    prefix-equi + left, aggregated to a single row."""
    d = _t(spark, sf, "documents")
    queries_df = normalize_queries(d, text_col="text")
    freq = prefix_frequencies(queries_df, max_len=8)
    sugg = top_k_per_group(
        freq,
        group_cols=["prefix"],
        order_by=[F.desc("frequency"), F.asc("query")],
        k=3,
    ).select("prefix", F.col("query").alias("sq"), "rk")
    w = Window.partitionBy("prefix").orderBy(F.md5("query").asc())
    clicked = (
        freq.select("prefix", "query")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("prefix", "query")
    )
    joined = clicked.join(
        sugg,
        (clicked["prefix"] == sugg["prefix"]) & (clicked["query"] == sugg["sq"]),
        "left",
    ).select(clicked["prefix"], "rk")
    return joined.agg(
        F.count(F.lit(1)).cast("long").alias("n_prefixes"),
        round4(
            F.avg(F.coalesce(1.0 / F.col("rk"), F.lit(0.0)))
        ).alias("mrr"),
        round4(
            F.avg(F.when(F.col("rk") == 1, 1.0).otherwise(0.0))
        ).alias("hit1"),
        round4(
            F.avg(F.when(F.col("rk").isNotNull(), 1.0).otherwise(0.0))
        ).alias("hit3"),
    )


ORACLES["suggest_mrr"] = f"""
    WITH q AS (
      SELECT substring(lower(trim(text)), 1, 500) AS query
      FROM documents WHERE text IS NOT NULL AND length(trim(text)) >= 2
    ), pairs AS (
      SELECT substring(query, 1, k.k) AS prefix, query
      FROM q CROSS JOIN (VALUES (2),(3),(4),(5),(6),(7),(8)) AS k(k)
      WHERE length(query) >= k.k
    ), freq AS (
      SELECT prefix, query, COUNT(*) AS frequency FROM pairs GROUP BY prefix, query
    ), ranked AS (
      SELECT prefix, query,
             ROW_NUMBER() OVER (PARTITION BY prefix
                                ORDER BY frequency DESC, query ASC) AS rk
      FROM freq
    ), sugg AS (
      SELECT prefix, query, rk FROM ranked WHERE rk <= 3
    ), clicked AS (
      SELECT prefix, query FROM (
        SELECT prefix, query,
               ROW_NUMBER() OVER (PARTITION BY prefix ORDER BY md5(query) ASC) AS rn
        FROM freq
      ) WHERE rn = 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_prefixes,
           {R("AVG(CASE WHEN s.rk IS NOT NULL THEN 1.0 / s.rk ELSE 0.0 END)")} AS mrr,
           {R("AVG(CASE WHEN s.rk = 1 THEN 1.0 ELSE 0.0 END)")} AS hit1,
           {R("AVG(CASE WHEN s.rk IS NOT NULL THEN 1.0 ELSE 0.0 END)")} AS hit3
    FROM clicked c
    LEFT JOIN sugg s ON s.prefix = c.prefix AND s.query = c.query
"""
QUERIES["suggest_mrr"] = q_suggest_mrr


def q_skyline_2d(spark, sf):
    """2-D skyline (Pareto frontier) of DISTINCT (price, date) order
    points — minimize price, maximize recency; a point survives iff no
    other is at-most-as-expensive AND at-least-as-recent with one strict.

    The classic sort-filter skyline: order by (price asc, date desc) and
    keep a point iff its date strictly exceeds the running max over all
    STRICTLY preceding points — a dimension-ordered running max over the
    distinct-pair relation, no pairwise dominance join (the O(n²) trap).
    Distinct-pair collapse first makes equal-point handling exact:
    duplicates are one point, and the running max needs no tie rules.
    The distinct-pair relation is fact-cardinality-bounded but SF-growing,
    so the running max is range-sharded (operators/rank.py
    exact_global_cumagg, round 9), never a whole-relation window."""
    from batch_processing_pipeline_spark.operators.rank import (
        exact_global_cumagg,
    )

    o = _t(spark, sf, "orders")
    pts = o.select(
        F.col("o_totalprice").alias("price"),
        F.to_date("o_orderdate").alias("d"),
    ).distinct()
    flagged = exact_global_cumagg(
        pts,
        [F.col("price").asc(), F.col("d").desc()],
        [("best_prev", "d", "max")],
        inclusive=False,
    )
    return (
        flagged.where(
            F.col("best_prev").isNull() | (F.col("d") > F.col("best_prev"))
        )
        .select(
            round4(F.col("price")).alias("price"),
            F.date_format("d", "yyyy-MM-dd").alias("order_date"),
        )
    )


ORACLES["skyline_2d"] = f"""
    WITH pts AS (
      SELECT DISTINCT o_totalprice AS price, CAST(o_orderdate AS DATE) AS d
      FROM orders
    ), flagged AS (
      SELECT price, d,
             MAX(d) OVER (ORDER BY price ASC, d DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_prev
      FROM pts
    )
    SELECT {R("price")} AS price,
           strftime(d, '%Y-%m-%d') AS order_date
    FROM flagged
    WHERE best_prev IS NULL OR d > best_prev
"""
QUERIES["skyline_2d"] = q_skyline_2d


def q_bootstrap_ci(spark, sf):
    """Poisson-bootstrap confidence interval for mean purchase value —
    THE distributed bootstrap (per-row independent Poisson(1) weights
    instead of a global with-replacement resample, so it needs no shuffle
    of the resample assignment and partial-aggregates map-side).

    Determinism discipline: the Poisson draw is the inverse CDF applied
    to the portable md5-uniform (operators/sampling.py), keyed on
    (event_id, replicate) — no RNG, identical in both engines. B = 100
    replicates amplify the FILTERED fact relation 100x into (replicate,
    w·x, w) partials; the CI is an exact interpolated percentile over
    the 100 replicate means."""
    B = 100
    e = _events(spark, sf).where(F.col("event_type") == "purchase").select(
        "event_id", "value"
    )
    reps = spark.range(0, B).select(F.col("id").cast("int").alias("b"))
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("boot:"),
                        F.col("event_id").cast("string"),
                        F.lit(":"),
                        F.col("b").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(4294967296.0)
    )
    # Poisson(1) inverse CDF ladder (cumulative probs to 6, tail -> 6)
    w = (
        F.when(u < 0.3678794412, 0)
        .when(u < 0.7357588823, 1)
        .when(u < 0.9196986029, 2)
        .when(u < 0.9810118431, 3)
        .when(u < 0.9963401532, 4)
        .when(u < 0.9994058152, 5)
        .otherwise(6)
        .cast("double")
    )
    weighted = e.crossJoin(F.broadcast(reps)).select(
        "b", w.alias("w"), (w * F.col("value")).alias("wx")
    )
    means = weighted.groupBy("b").agg(
        (F.sum("wx") / F.sum("w")).alias("m")
    )
    base = e.agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.avg("value").alias("mean_v"),
    )
    ci = means.agg(
        F.percentile("m", F.lit(0.025)).alias("lo"),
        F.percentile("m", F.lit(0.975)).alias("hi"),
    )
    return base.crossJoin(ci).select(
        "n_events",
        round4(F.col("mean_v")).alias("mean_value"),
        round4(F.col("lo")).alias("ci_lo"),
        round4(F.col("hi")).alias("ci_hi"),
    )


ORACLES["bootstrap_ci"] = f"""
    WITH e AS (
      SELECT event_id, value FROM events WHERE event_type = 'purchase'
    ), reps AS (
      SELECT CAST(b AS INTEGER) AS b FROM UNNEST(range(0, 100)) AS t(b)
    ), draws AS (
      SELECT b,
             CAST(CAST('0x' || substr(md5('boot:' || CAST(event_id AS VARCHAR)
                    || ':' || CAST(b AS VARCHAR)), 1, 8) AS BIGINT) AS DOUBLE)
               / 4294967296.0 AS u,
             value
      FROM e CROSS JOIN reps
    ), weighted AS (
      SELECT b,
             CAST(CASE WHEN u < 0.3678794412 THEN 0
                       WHEN u < 0.7357588823 THEN 1
                       WHEN u < 0.9196986029 THEN 2
                       WHEN u < 0.9810118431 THEN 3
                       WHEN u < 0.9963401532 THEN 4
                       WHEN u < 0.9994058152 THEN 5
                       ELSE 6 END AS DOUBLE) AS w,
             value
      FROM draws
    ), means AS (
      SELECT b, SUM(w * value) / SUM(w) AS m FROM weighted GROUP BY b
    ), base AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_events, AVG(value) AS mean_v
      FROM e
    )
    SELECT base.n_events,
           {R("base.mean_v")} AS mean_value,
           {R("(SELECT quantile_cont(m, 0.025) FROM means)")} AS ci_lo,
           {R("(SELECT quantile_cont(m, 0.975) FROM means)")} AS ci_hi
    FROM base
"""
QUERIES["bootstrap_ci"] = q_bootstrap_ci


def q_partitioned_write(spark, sf):
    """Hive-style partitioned sink + partition-pruned source round trip:
    documents written ``partitionBy(lang)``, re-read with a lang
    predicate. At 100 TB the partition column IS the primary pruning
    axis — the filtered read must open only the matching directories
    (asserted via inputFiles in test_round5_queries), and the partition
    column must round-trip losslessly through the directory encoding.
    Output is the per-source rollup of the pruned read; the oracle
    computes it from the original table with the same predicate."""
    import os

    store = _roundtrip_store(spark, sf, "pwrite")
    d = _t(spark, sf, "documents")
    if not os.path.exists(os.path.join(store, "_SUCCESS")):
        d.write.mode("overwrite").partitionBy("lang").parquet(store)
    back = spark.read.parquet(store).where(F.col("lang").isin("en", "de"))
    return back.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


ORACLES["partitioned_write"] = """
    SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents WHERE lang IN ('en', 'de')
    GROUP BY lang, source
"""
QUERIES["partitioned_write"] = q_partitioned_write


def q_csv_badrows(spark, sf):
    """Malformed-row quarantine on CSV ingest (PERMISSIVE +
    columnNameOfCorruptRecord): the ingestion reality at 100 TB is that
    some rows are garbage, and one bad row must neither abort the job
    (FAILFAST) nor silently vanish (DROPMALFORMED) — it lands in the
    corrupt-record column for audit. The query writes a deterministic
    CSV with planted malformed lines (every 7th doc_id emits a
    non-numeric id), re-reads it PERMISSIVE, and reports good/bad counts
    plus the recoverable char total; the oracle derives all three
    arithmetically from the original table."""
    import os

    store = _roundtrip_store(spark, sf, "badcsv")
    d = _t(spark, sf, "documents").select("doc_id", "lang", "n_chars")
    line = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(F.lit("not-a-number,"), F.col("lang"), F.lit(",x")),
    ).otherwise(
        F.concat_ws(
            ",",
            F.col("doc_id").cast("string"),
            F.col("lang"),
            F.col("n_chars").cast("string"),
        )
    )
    if not os.path.exists(os.path.join(store, "_SUCCESS")):
        d.select(line.alias("value")).write.mode("overwrite").text(store)
    back = (
        spark.read.schema(
            "doc_id long, lang string, n_chars long, _bad string"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .csv(store)
    )
    return back.agg(
        F.count(F.when(F.col("_bad").isNull(), 1)).alias("n_good"),
        F.count(F.when(F.col("_bad").isNotNull(), 1)).alias("n_bad"),
        F.sum(F.when(F.col("_bad").isNull(), F.col("n_chars"))).alias(
            "good_chars"
        ),
    )


ORACLES["csv_badrows"] = """
    SELECT CAST(SUM(CASE WHEN doc_id % 7 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_good,
           CAST(SUM(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bad,
           CAST(SUM(CASE WHEN doc_id % 7 <> 0 THEN n_chars END) AS BIGINT)
             AS good_chars
    FROM documents
"""
QUERIES["csv_badrows"] = q_csv_badrows


def q_schema_evolution(spark, sf):
    """Schema evolution across parquet batches (mergeSchema): an early
    batch without the ``quality`` column and a later batch with it land
    in one store; the merged read surfaces the union schema with NULLs
    for the pre-evolution rows — the append-only data-lake reality
    (new extraction fields appear mid-corpus; old files are never
    rewritten). The rollup pins NULL semantics of the evolved column;
    the oracle reconstructs both batches from the original table."""
    import os

    store = _roundtrip_store(spark, sf, "evolve")
    d = _t(spark, sf, "documents")
    old = d.where(F.col("doc_id") % 2 == 0).select("doc_id", "lang")
    new = d.where(F.col("doc_id") % 2 == 1).select(
        "doc_id", "lang", (F.col("n_chars") % 100).alias("quality")
    )
    if not os.path.exists(os.path.join(store, "b1", "_SUCCESS")):
        old.write.mode("overwrite").parquet(os.path.join(store, "b1"))
        new.write.mode("overwrite").parquet(os.path.join(store, "b2"))
    back = spark.read.option("mergeSchema", True).parquet(
        os.path.join(store, "b1"), os.path.join(store, "b2")
    )
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count("quality").alias("n_with_quality"),
        F.sum("quality").alias("quality_sum"),
    )


ORACLES["schema_evolution"] = """
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_with_quality,
           CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN n_chars % 100 END) AS BIGINT)
             AS quality_sum
    FROM documents GROUP BY lang
"""
QUERIES["schema_evolution"] = q_schema_evolution


def q_group_split(spark, sf):
    """GROUP-aware train/val/test split: the split key is the USER, not
    the row, so every event of a user lands in one split — the
    leak-free boundary for behavioral training data (a per-row split
    leaks user identity across train/test; group splitting is the
    standard fix). Same cumulative-hash CASE ladder as split_assign,
    keyed on user_id; the output pins both the per-split rollup AND the
    no-straddle invariant (max splits per user, which must be 1)."""
    from batch_processing_pipeline_spark.operators.sampling import assign_split

    e = _events(spark, sf).select("user_id", "event_id")
    s = assign_split(e, _SPLIT_WEIGHTS, key_col="user_id", seed="gsp")
    per_user = s.groupBy("user_id").agg(
        F.countDistinct("split").alias("n_splits")
    )
    straddle = per_user.agg(
        F.max("n_splits").cast("long").alias("max_splits_per_user")
    )
    rollup = s.groupBy("split").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return rollup.crossJoin(F.broadcast(straddle)).select(
        "split", "n_users", "n_events", "max_splits_per_user"
    )


def _group_split_case_sql() -> str:
    total = sum(_SPLIT_WEIGHTS.values())
    names = list(_SPLIT_WEIGHTS)
    acc = 0.0
    branches = []
    for name in names[:-1]:
        acc += _SPLIT_WEIGHTS[name] / total
        branches.append(
            "WHEN substr(md5('gsp:' || CAST(user_id AS VARCHAR)), 1, 8)"
            f" < '{hex_threshold(acc)}' THEN '{name}'"
        )
    return "CASE " + " ".join(branches) + f" ELSE '{names[-1]}' END"


ORACLES["group_split"] = f"""
    WITH s AS (
      SELECT user_id, event_id, {_group_split_case_sql()} AS split
      FROM events
    ), straddle AS (
      SELECT CAST(MAX(n) AS BIGINT) AS max_splits_per_user FROM (
        SELECT user_id, COUNT(DISTINCT split) AS n FROM s GROUP BY user_id
      )
    )
    SELECT split, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           (SELECT max_splits_per_user FROM straddle) AS max_splits_per_user
    FROM s GROUP BY split
"""
QUERIES["group_split"] = q_group_split


def q_woe_iv(spark, sf):
    """Weight-of-evidence binning + information value of order price
    against the 'F' status outcome — the credit-scoring feature audit
    (WOE_i = ln(%good_i / %bad_i), IV = sum (%good_i - %bad_i) * WOE_i;
    IV < 0.02 means the feature is useless, > 0.5 suspicious). Fixed-
    width bins (quantile cut points would hinge on interpolated ulps —
    the psi_drift lesson) and Laplace +0.5 cell smoothing so empty cells
    stay finite in both engines. Everything after the one fact-table
    groupBy is window math over the bin relation."""
    o = _t(spark, sf, "orders")
    binned = o.select(
        F.least(
            F.floor(F.col("o_totalprice") / 50000.0).cast("long"), F.lit(7)
        ).alias("bin"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("bad"),
    )
    per_bin = binned.groupBy("bin").agg(
        F.sum(1 - F.col("bad")).cast("double").alias("g"),
        F.sum("bad").cast("double").alias("b"),
    )
    w = Window.partitionBy()
    t = per_bin.select(
        "bin",
        "g",
        "b",
        F.sum("g").over(w).alias("tg"),
        F.sum("b").over(w).alias("tb"),
        F.count(F.lit(1)).over(w).alias("nb"),
    )
    pg = (F.col("g") + 0.5) / (F.col("tg") + 0.5 * F.col("nb"))
    pb = (F.col("b") + 0.5) / (F.col("tb") + 0.5 * F.col("nb"))
    woe = F.log(pg / pb)
    return t.select(
        "bin",
        (F.col("g") + F.col("b")).cast("long").alias("n_orders"),
        round4(woe).alias("woe"),
        round4(F.sum((pg - pb) * woe).over(w)).alias("iv_total"),
    )


ORACLES["woe_iv"] = f"""
    WITH binned AS (
      SELECT LEAST(CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT), 7) AS bin,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS bad
      FROM orders
    ), per_bin AS (
      SELECT bin, CAST(SUM(1 - bad) AS DOUBLE) AS g,
             CAST(SUM(bad) AS DOUBLE) AS b
      FROM binned GROUP BY bin
    ), t AS (
      SELECT bin, g, b,
             SUM(g) OVER () AS tg, SUM(b) OVER () AS tb,
             COUNT(*) OVER () AS nb
      FROM per_bin
    )
    SELECT bin,
           CAST(g + b AS BIGINT) AS n_orders,
           {R("ln(((g + 0.5) / (tg + 0.5 * nb)) / ((b + 0.5) / (tb + 0.5 * nb)))")} AS woe,
           {R("SUM(((g + 0.5) / (tg + 0.5 * nb) - (b + 0.5) / (tb + 0.5 * nb))"
              " * ln(((g + 0.5) / (tg + 0.5 * nb)) / ((b + 0.5) / (tb + 0.5 * nb))))"
              " OVER ()")} AS iv_total
    FROM t
"""
QUERIES["woe_iv"] = q_woe_iv


def q_mm_image_phash(spark, sf):
    """Perceptual image near-dup groups over REAL decode: synthesize a
    PNG per document, re-ingest every fifth one under a new id (the
    re-crawled-image scenario), dHash all payloads (decode -> grayscale
    -> 9x8 resample -> 64 comparison bits), and group by hash — the
    image twin of exact_dedup: after the Arrow decode stage only
    (id, 16-hex) rows shuffle, never pixels.

    Hash-dependent output (dHash collisions are by design — that's what
    makes it NEAR-dup) -> rows-only; pytest pins planted-copy recovery
    and rerun stability."""
    from batch_processing_pipeline_spark.multimodal.binary_ops import (
        dhash_images,
        synthesize_png,
    )

    d = _t(spark, sf, "documents").select("doc_id", "text")
    recrawl = d.where(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"), "text"
    )
    corpus = d.unionByName(recrawl)
    hashes = dhash_images(synthesize_png(corpus))
    return (
        hashes.groupBy("dhash")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_images"),
            F.min("doc_id").alias("first_id"),
        )
        .where(F.col("n_images") > 1)
    )


ORACLES["mm_image_phash"] = None
QUERIES["mm_image_phash"] = q_mm_image_phash


def q_spell_correct(spark, sf):
    """Query-log spell correction ("did you mean"): rare tokens are
    corrected to the highest-frequency vocabulary word within edit
    distance 1, found by the same SymSpell deletion-neighborhood
    equi-join as entity_resolution — never an all-pairs edit-distance
    scan. The reference's serving domain (autocomplete over query logs)
    is exactly where this runs: head terms form the vocabulary, tail
    typos map onto it.

    Determinism contract: candidate ranking is (frequency DESC, word
    ASC); vocabulary = tokens with count >= 10, correction targets =
    tokens with count <= 2 and length >= 4 (short tokens are too
    ambiguous to correct — standard practice). The fixture corpus has no
    organic typos, so the query PLANTS them (the dedup_minhash
    discipline): every 17th document contributes one corrupted copy of
    its first word (char at a key-derived position dropped) to the token
    stream."""
    d = _t(spark, sf, "documents")
    base_tokens = d.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), " ", -1)).alias("w")
    ).where(F.col("w") != "")
    fw = F.split(F.lower(F.trim(F.col("text"))), " ", -1)[0]
    typo_pos = F.pmod(F.col("doc_id"), F.length(fw) - 1) + 2
    typos = (
        d.where((F.col("doc_id") % 17 == 0) & (F.length(fw) >= 5))
        .select(fw.alias("fw"), typo_pos.alias("p"))
        .select(
            F.concat(
                F.expr("substring(fw, 1, p - 1)"),
                F.expr("substring(fw, p + 1, length(fw))"),
            ).alias("w")
        )
    )
    words = (
        base_tokens.unionByName(typos)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        # materialized ONCE (round 12, guide §3.3): vocab and rare each
        # feed two branches (deletion explode + identity union), so the
        # corpus-wide token aggregation re-ran FOUR times before (8
        # scans in the before-plan). The relation is vocabulary-sized
        # (Zipf-compact at any corpus scale). Measured same-session A/B
        # at sf0.1: 0.94 → 0.68 s.
        .localCheckpoint(eager=True)
    )
    vocab = words.where(F.col("n") >= 10)
    rare = words.where((F.col("n") <= 2) & (F.length("w") >= 4))

    def del_keys(df, wcol, ncol, out_n):
        return df.select(
            F.col(wcol).alias("w"),
            F.col(ncol).alias(out_n),
            F.explode(
                F.sequence(F.lit(1), F.length(wcol))
            ).alias("p"),
        ).select(
            "w",
            out_n,
            "p",
            F.concat(
                F.expr("substring(w, 1, p - 1)"),
                F.expr("substring(w, p + 1, length(w))"),
            ).alias("bkey"),
        )

    # deletion neighborhoods joined on the VARIANT STRING alone (not the
    # position): deletes/inserts shift positions, so unlike the pure-
    # substitution ER model the key must be position-free; all edit-1
    # pairs (sub/del/ins) then share >= 1 variant — including the word
    # itself for deletions (variant of rare == vocab word) — so recall
    # needs the word unioned into its own neighborhood
    rk = del_keys(rare, "w", "n", "rn").select("w", "rn", "bkey").unionByName(
        rare.select("w", F.col("n").alias("rn"), F.col("w").alias("bkey"))
    )
    vk = del_keys(vocab, "w", "n", "vn").select(
        F.col("w").alias("vw"), "vn", "bkey"
    ).unionByName(
        vocab.select(F.col("w").alias("vw"), F.col("n").alias("vn"), F.col("w").alias("bkey"))
    )
    cand = (
        rk.join(vk, "bkey")
        .select("w", "rn", "vw", "vn")
        .distinct()
        .where(F.levenshtein(F.col("w"), F.col("vw")) == 1)
    )
    w_rank = Window.partitionBy("w").orderBy(
        F.col("vn").desc(), F.col("vw").asc()
    )
    return (
        cand.withColumn("rk", F.row_number().over(w_rank))
        .where(F.col("rk") == 1)
        .select(
            F.col("w").alias("typo"),
            F.col("rn").cast("long").alias("typo_count"),
            F.col("vw").alias("correction"),
            F.col("vn").cast("long").alias("correction_count"),
        )
    )


ORACLES["spell_correct"] = """
    WITH toks AS (
      SELECT w FROM (
        SELECT unnest(string_split(lower(trim(text)), ' ')) AS w
        FROM documents
      ) WHERE w <> ''
      UNION ALL
      SELECT substr(fw, 1, CAST(p AS INTEGER) - 1)
               || substr(fw, CAST(p AS INTEGER) + 1, length(fw)) AS w
      FROM (
        SELECT string_split(lower(trim(text)), ' ')[1] AS fw,
               doc_id % (length(string_split(lower(trim(text)), ' ')[1]) - 1)
                 + 2 AS p
        FROM documents
        WHERE doc_id % 17 = 0
          AND length(string_split(lower(trim(text)), ' ')[1]) >= 5
      )
    ), words AS (
      SELECT w, COUNT(*) AS n FROM toks GROUP BY w
    ), vocab AS (
      SELECT w, n FROM words WHERE n >= 10
    ), rare AS (
      SELECT w, n FROM words WHERE n <= 2 AND length(w) >= 4
    ), rk AS (
      SELECT w, n AS rn,
             substr(w, 1, CAST(p AS INTEGER) - 1)
               || substr(w, CAST(p AS INTEGER) + 1, length(w)) AS bkey
      FROM rare, UNNEST(range(1, length(w) + 1)) AS u(p)
      UNION
      SELECT w, n, w FROM rare
    ), vk AS (
      SELECT w AS vw, n AS vn,
             substr(w, 1, CAST(p AS INTEGER) - 1)
               || substr(w, CAST(p AS INTEGER) + 1, length(w)) AS bkey
      FROM vocab, UNNEST(range(1, length(w) + 1)) AS u(p)
      UNION
      SELECT w, n, w FROM vocab
    ), cand AS (
      SELECT DISTINCT r.w, r.rn, v.vw, v.vn
      FROM rk r JOIN vk v USING (bkey)
      WHERE levenshtein(r.w, v.vw) = 1
    )
    SELECT w AS typo, CAST(rn AS BIGINT) AS typo_count,
           vw AS correction, CAST(vn AS BIGINT) AS correction_count
    FROM (
      SELECT w, rn, vw, vn,
             ROW_NUMBER() OVER (PARTITION BY w
               ORDER BY vn DESC, vw ASC) AS rk
      FROM cand
    ) WHERE rk = 1
"""
QUERIES["spell_correct"] = q_spell_correct


def q_mm_curation_pipeline(spark, sf):
    """The composed MULTIMODAL curation funnel (plans/mm_curation.py):
    text quality -> image dimension gate (REAL PNG decode) -> audio
    energy gate (REAL WAV decode) -> exact dedup, with per-stage
    accounting — the pretrain_pipeline twin for (text, image, audio)
    triples. The DuckDB oracle re-derives every gate arithmetically from
    the deterministic payload generators, so the decode stages are
    differentially pinned end to end."""
    from batch_processing_pipeline_spark.plans.mm_curation import (
        mm_curation_pipeline,
    )

    d = _t(spark, sf, "documents").select("doc_id", "text")
    return mm_curation_pipeline(spark, d)


from batch_processing_pipeline_spark.plans.mm_curation import MIN_RMS_SQ as _MM_RMS_SQ  # noqa: E501 — single shared threshold constant (plan + oracle)

ORACLES["mm_curation_pipeline"] = f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE length(trim(text)) > 0
    ), s1 AS (
      SELECT * FROM corpus
      WHERE CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
              / length(text) >= 0.5
    ), s2 AS (
      SELECT * FROM s1
      WHERE length(text) % 13 + 1 >= 3 AND length(text) % 7 + 1 >= 3
    ), nrg AS (
      -- exact integer energy: clip RMS >= 70 <=> SUM(energy) >= MIN_RMS_SQ*n
      SELECT doc_id,
             SUM(CAST(((i * step) % 256 - 128)
                      * ((i * step) % 256 - 128) AS BIGINT)) AS energy,
             COUNT(*) AS n
      FROM (
        SELECT doc_id, length(text) % 50 + 20 AS n,
               length(text) % 7 + 2 AS step
        FROM s2
      ), UNNEST(range(0, (n // 16) * 16)) AS u(i)
      GROUP BY doc_id
    ), s3 AS (
      SELECT s2.* FROM s2 JOIN nrg USING (doc_id)
      WHERE nrg.energy >= {_MM_RMS_SQ} * nrg.n
    ), s4 AS (
      SELECT * FROM s3 WHERE doc_id IN (
        SELECT MIN(doc_id) FROM s3 GROUP BY md5(lower(trim(text)))
      )
    )
    SELECT CAST(0 AS INTEGER) AS stage_idx, 'corpus' AS stage,
           CAST(COUNT(*) AS BIGINT) AS n_docs FROM corpus
    UNION ALL SELECT 1, 'text_quality', COUNT(*) FROM s1
    UNION ALL SELECT 2, 'image_dims', COUNT(*) FROM s2
    UNION ALL SELECT 3, 'audio_energy', COUNT(*) FROM s3
    UNION ALL SELECT 4, 'exact_dedup', COUNT(*) FROM s4
"""
QUERIES["mm_curation_pipeline"] = q_mm_curation_pipeline


def q_jsonl_roundtrip(spark, sf):
    """JSON-lines sink + source round trip with NESTED structure — the
    pretraining-corpus interchange format (every public text dataset
    ships as JSONL with a metadata object). Documents are written with a
    nested meta struct and a tag array, re-read against an explicit
    schema (never inference at scale — schema drift in file N+1 silently
    retypes a column), and rolled up including a nested field and an
    array length; the oracle computes the same from the original table,
    so struct/array/unicode round-tripping is hash-pinned."""
    import os

    store = _roundtrip_store(spark, sf, "jsonl")
    d = _t(spark, sf, "documents")
    enriched = d.select(
        "doc_id",
        "text",
        F.struct(
            F.col("lang"),
            F.col("source"),
            F.col("n_chars").alias("chars"),
        ).alias("meta"),
        F.array(F.col("lang"), F.col("source")).alias("tags"),
    )
    if not os.path.exists(os.path.join(store, "_SUCCESS")):
        enriched.write.mode("overwrite").json(store)
    back = spark.read.schema(
        "doc_id long, text string, "
        "meta struct<lang:string, source:string, chars:long>, "
        "tags array<string>"
    ).json(store)
    return back.groupBy(F.col("meta.lang").alias("lang")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("meta.chars").alias("total_chars"),
        F.sum(F.length("text")).alias("text_chars"),
        F.sum(F.size("tags")).cast("long").alias("tag_count"),
        F.countDistinct("meta.source").alias("n_sources"),
    )


ORACLES["jsonl_roundtrip"] = """
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(length(text)) AS BIGINT) AS text_chars,
           CAST(COUNT(*) * 2 AS BIGINT) AS tag_count,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
    FROM documents GROUP BY lang
"""
QUERIES["jsonl_roundtrip"] = q_jsonl_roundtrip


def q_managed_table(spark, sf):
    """Catalog / managed-table DDL surface: CREATE TABLE ... USING
    PARQUET AS SELECT, INSERT INTO, then query the managed table — the
    warehouse path (saveAsTable / metastore) as opposed to path-based
    reads. The table is created from the first 20 days of events and the
    tail is INSERTed, so the query also pins append semantics; the
    oracle recomputes the union from raw events.

    The table name is keyed by the sf fixture (the warehouse directory
    persists across sessions — a fixed name would serve a stale table
    from a different scale factor) and dropped at exit."""
    import atexit
    import hashlib
    import os

    tag = hashlib.md5(os.path.abspath(sf).encode()).hexdigest()[:8]
    tbl = f"events_rollup2_{tag}"  # v2: sv stored as exact long cents (r12 sweep)
    e = _events(spark, sf).select(
        F.to_date("ts").alias("d"), "event_type", "value"
    )
    cutoff = "2024-01-21"
    if tbl not in _SMB_CLEANUP_DIRS:
        _SMB_CLEANUP_DIRS.add(tbl)
        # remove the warehouse DIRECTORY at exit: the in-memory catalog
        # forgets the table across sessions, but a leftover directory
        # makes the next session's saveAsTable fail with path-exists
        import shutil

        wh = os.path.join(
            spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:"),
            tbl,
        )
        atexit.register(shutil.rmtree, wh, ignore_errors=True)
    if not spark.catalog.tableExists(tbl):
        e.where(F.col("d") < F.lit(cutoff)).groupBy("d", "event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(cents(F.col("value"))).alias("sv_c"),
        ).write.format("parquet").saveAsTable(tbl)
        tail = (
            e.where(F.col("d") >= F.lit(cutoff))
            .groupBy("d", "event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(cents(F.col("value"))).alias("sv_c"),
            )
        )
        tail.write.insertInto(tbl)
    return spark.table(tbl).groupBy("event_type").agg(
        F.sum("n").cast("long").alias("n_events"),
        F.countDistinct("d").alias("n_days"),
        round4(F.sum("sv_c") / F.lit(100.0)).alias("total_value"),
    )


ORACLES["managed_table"] = f"""
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
           {R(f"SUM({sql_cents('value')}) / CAST(100.0 AS DOUBLE)")} AS total_value
    FROM events GROUP BY event_type
"""
QUERIES["managed_table"] = q_managed_table


def q_forecast_eval(spark, sf):
    """Forecast backtest scoreboard: three standard baselines (naive-1,
    seasonal-naive-7, trailing 7-day mean) evaluated in-sample with
    MAE / RMSE / MAPE over the daily series — the model-selection
    readout that decides whether anything fancier than a baseline is
    worth running. Every prediction is a lag/window expression over the
    dimension-sized daily relation; each method scores only days where
    its prediction is defined (the standard backtest convention), so
    method rows have different n_days by design."""
    e = _events(spark, sf)
    daily = e.groupBy(
        F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("d")
    ).agg(F.count(F.lit(1)).cast("double").alias("x"))
    w = Window.orderBy("d")
    w7 = Window.orderBy("d").rowsBetween(-7, -1)
    preds = daily.select(
        "d",
        "x",
        F.lag("x", 1).over(w).alias("naive1"),
        F.lag("x", 7).over(w).alias("snaive7"),
        F.when(
            F.count(F.lit(1)).over(w7) == 7, F.avg("x").over(w7)
        ).alias("ma7"),
    )
    methods = []
    for name in ("naive1", "snaive7", "ma7"):
        p = F.col(name)
        err = F.col("x") - p
        methods.append(
            preds.where(p.isNotNull()).agg(
                F.lit(name).alias("method"),
                F.count(F.lit(1)).cast("long").alias("n_days"),
                round4(F.avg(F.abs(err))).alias("mae"),
                round4(F.sqrt(F.avg(err * err))).alias("rmse"),
                round4(F.avg(F.abs(err) / F.col("x"))).alias("mape"),
            )
        )
    out = methods[0]
    for m in methods[1:]:
        out = out.unionByName(m)
    return out


ORACLES["forecast_eval"] = f"""
    WITH daily AS (
      SELECT CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS d,
             CAST(COUNT(*) AS DOUBLE) AS x
      FROM events GROUP BY 1
    ), preds AS (
      SELECT d, x,
             LAG(x, 1) OVER (ORDER BY d) AS naive1,
             LAG(x, 7) OVER (ORDER BY d) AS snaive7,
             CASE WHEN COUNT(*) OVER w7 = 7 THEN AVG(x) OVER w7 END AS ma7
      FROM daily
      WINDOW w7 AS (ORDER BY d ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    )
    SELECT 'naive1' AS method, CAST(COUNT(*) AS BIGINT) AS n_days,
           {R("AVG(ABS(x - naive1))")} AS mae,
           {R("SQRT(AVG((x - naive1) * (x - naive1)))")} AS rmse,
           {R("AVG(ABS(x - naive1) / x)")} AS mape
    FROM preds WHERE naive1 IS NOT NULL
    UNION ALL
    SELECT 'snaive7', COUNT(*),
           {R("AVG(ABS(x - snaive7))")},
           {R("SQRT(AVG((x - snaive7) * (x - snaive7)))")},
           {R("AVG(ABS(x - snaive7) / x)")}
    FROM preds WHERE snaive7 IS NOT NULL
    UNION ALL
    SELECT 'ma7', COUNT(*),
           {R("AVG(ABS(x - ma7))")},
           {R("SQRT(AVG((x - ma7) * (x - ma7)))")},
           {R("AVG(ABS(x - ma7) / x)")}
    FROM preds WHERE ma7 IS NOT NULL
"""
QUERIES["forecast_eval"] = q_forecast_eval


def q_auc_eval(spark, sf):
    """Binary-classifier evaluation without a single threshold sweep:
    ROC AUC via the rank-sum identity (AUC = (sum of positive ranks -
    n_pos(n_pos+1)/2) / (n_pos * n_neg), midranks for score ties — the
    Mann-Whitney correspondence), plus precision/recall/F1 at the fixed
    0.5 operating point. Scores and labels are deterministic functions
    of the events fixture (score = the portable md5-uniform blended with
    the label so AUC lands strictly between 0.5 and 1 — a degenerate
    0.5 or 1.0 AUC would not exercise the rank math).

    Scale shape: midranks come from a running count over DISTINCT
    scores — value-cardinality bounded at ~10^6 by the 6-decimal floor,
    and since round 9 range-sharded anyway (exact_global_cumagg, the
    ks_test discipline) — never a global per-row sort."""
    e = _events(spark, sf)
    label = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
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
    # label-shifted score: positives drawn from [0.3, 1), negatives
    # [0, 0.7); bucketed to 6 decimals via the PORTABLE floor formula
    # (engine-native ROUND drifts at half-way doubles — rounding.py) so
    # score ties exist and the midrank path is exercised
    raw = F.when(label == 1, 0.3 + 0.7 * u).otherwise(0.7 * u)
    score = F.floor(raw * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)
    scored = e.select(score.alias("s"), label.alias("y"))
    per_s = scored.groupBy("s").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("y").alias("pos"),
    )
    from batch_processing_pipeline_spark.operators.rank import (
        exact_global_cumagg,
    )

    ranked = exact_global_cumagg(
        per_s, [F.col("s").asc()], [("ccnt", "cnt", "sum")]
    ).select(
        "s",
        "cnt",
        "pos",
        (
            (F.col("ccnt") - F.col("cnt")).cast("double")
            + (F.col("cnt").cast("double") + 1.0) / 2.0
        ).alias("midrank"),
    )
    agg = ranked.agg(
        F.sum("cnt").cast("double").alias("n"),
        F.sum("pos").cast("double").alias("np"),
        F.sum(F.col("pos").cast("double") * F.col("midrank")).alias("sr_pos"),
        F.sum(
            F.when(F.col("s") >= 0.5, F.col("pos")).otherwise(0)
        ).cast("double").alias("tp"),
        F.sum(
            F.when(F.col("s") >= 0.5, F.col("cnt") - F.col("pos")).otherwise(0)
        ).cast("double").alias("fp"),
    )
    nn = F.col("n") - F.col("np")
    auc = (F.col("sr_pos") - F.col("np") * (F.col("np") + 1.0) / 2.0) / (
        F.col("np") * nn
    )
    prec = F.col("tp") / (F.col("tp") + F.col("fp"))
    rec = F.col("tp") / F.col("np")
    return agg.select(
        F.col("np").cast("long").alias("n_pos"),
        nn.cast("long").alias("n_neg"),
        round4(auc).alias("auc"),
        round4(prec).alias("precision_at_half"),
        round4(rec).alias("recall_at_half"),
        round4(2.0 * prec * rec / (prec + rec)).alias("f1_at_half"),
    )


ORACLES["auc_eval"] = f"""
    WITH scored AS (
      SELECT floor((CASE WHEN event_type = 'purchase'
                    THEN 0.3 + 0.7 * u ELSE 0.7 * u END)
                   * CAST(1000000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE))
               / CAST(1000000.0 AS DOUBLE) AS s,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM (
        SELECT event_type,
               CAST(CAST('0x' || substr(md5('auc:' || CAST(event_id AS VARCHAR)),
                    1, 8) AS BIGINT) AS DOUBLE) / 4294967296.0 AS u
        FROM events
      )
    ), per_s AS (
      SELECT s, COUNT(*) AS cnt, SUM(y) AS pos FROM scored GROUP BY s
    ), ranked AS (
      SELECT s, cnt, pos,
             CAST(SUM(cnt) OVER (ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt
               AS DOUBLE) + (CAST(cnt AS DOUBLE) + 1.0) / 2.0 AS midrank
      FROM per_s
    ), agg AS (
      SELECT CAST(SUM(cnt) AS DOUBLE) AS n,
             CAST(SUM(pos) AS DOUBLE) AS np,
             SUM(CAST(pos AS DOUBLE) * midrank) AS sr_pos,
             CAST(SUM(CASE WHEN s >= 0.5 THEN pos ELSE 0 END) AS DOUBLE) AS tp,
             CAST(SUM(CASE WHEN s >= 0.5 THEN cnt - pos ELSE 0 END) AS DOUBLE) AS fp
      FROM ranked
    )
    SELECT CAST(np AS BIGINT) AS n_pos,
           CAST(n - np AS BIGINT) AS n_neg,
           {R("(sr_pos - np * (np + 1.0) / 2.0) / (np * (n - np))")} AS auc,
           {R("tp / (tp + fp)")} AS precision_at_half,
           {R("tp / np")} AS recall_at_half,
           {R("2.0 * (tp / (tp + fp)) * (tp / np) / "
              "(tp / (tp + fp) + tp / np)")} AS f1_at_half
    FROM agg
"""
QUERIES["auc_eval"] = q_auc_eval




def _copurchase_graph(spark, sf, max_parts: int = 3):
    """The sparsified co-purchase part graph shared by the graph-family
    queries (label_propagation, bfs_hops): orders with <= ``max_parts``
    distinct parts contribute an undirected clique over their parts.
    The full co-purchase graph is so dense that community/traversal
    readouts degenerate (LPA collapses to one label), so only small
    orders keep edges. Returns the deduped u<v edge relation,
    PERSISTED (caller must unpersist after its iteration severs
    lineage); the graph_iter operators symmetrize it internally."""
    li = (
        _t(spark, sf, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .withColumn(
            "_osz", F.count(F.lit(1)).over(Window.partitionBy("l_orderkey"))
        )
        .where(F.col("_osz") <= max_parts)
        .drop("_osz")
    )
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
        .persist()
    )
    return edges


def _copurchase_graph_ctes(max_parts: int = 3) -> list[str]:
    """The oracle twin of ``_copurchase_graph``: the li/e/bidir CTE
    strings every graph-family oracle opens with. QUALIFY windows
    evaluate BEFORE DISTINCT in DuckDB, so the distinct-parts-per-order
    count needs an explicit inner subquery."""
    return [
        "li AS MATERIALIZED (SELECT l_orderkey, l_partkey FROM"
        " (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)"
        f" QUALIFY COUNT(*) OVER (PARTITION BY l_orderkey) <= {max_parts})",
        "e AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v"
        " FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey"
        " AND a.l_partkey < b.l_partkey)",
        "bidir AS MATERIALIZED (SELECT u, v FROM e UNION ALL SELECT v, u FROM e)",
    ]


def q_label_propagation(spark, sf):
    """Community detection by SYNCHRONOUS label propagation (Raghavan et
    al. 2007) on the co-purchase part graph — the missing graph family
    beside connectivity (dedup_clusters), centrality (pagerank), density
    (k_core), and counting (triangle_count). Exactly 5 synchronized
    rounds: every node simultaneously adopts its neighbors' most frequent
    label, ties to the SMALLEST label — a fixed round count makes the
    result deterministic without a convergence predicate (synchronous
    LPA can oscillate, so 'run to convergence' is not well-defined;
    fixed-horizon LPA is the standard spark/graphframes semantics).
    Output: per final label, community size and min/max member — the
    community-structure readout. The graph keeps only small orders
    (<=3 distinct parts) so real community structure survives — the
    full co-purchase graph is so dense that LPA degenerately collapses
    it to one label. Each round is one explode-both-ways join + a
    windowed argmax; the oracle unrolls the same 5 rounds as
    MATERIALIZED CTEs."""
    from batch_processing_pipeline_spark.operators.graph_iter import (
        label_propagation,
    )

    edges = _copurchase_graph(spark, sf)
    labels = label_propagation(edges, rounds=5)
    edges.unpersist()
    return (
        labels.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("community_size"),
            F.min("n").alias("min_member"),
            F.max("n").alias("max_member"),
        )
        .select(
            F.col("label").cast("long").alias("label"),
            "community_size",
            F.col("min_member").cast("long").alias("min_member"),
            F.col("max_member").cast("long").alias("max_member"),
        )
    )


def _label_propagation_oracle(rounds: int = 5) -> str:
    parts = _copurchase_graph_ctes() + [
        "l0 AS MATERIALIZED (SELECT DISTINCT u AS n, u AS label FROM bidir)",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"l{i} AS MATERIALIZED (SELECT n, label FROM ("
            f" SELECT b.u AS n, l.label, COUNT(*) AS c,"
            f" ROW_NUMBER() OVER (PARTITION BY b.u"
            f" ORDER BY COUNT(*) DESC, l.label ASC) AS rk"
            f" FROM bidir b JOIN l{i-1} l ON l.n = b.v"
            f" GROUP BY b.u, l.label) WHERE rk = 1)"
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
    SELECT CAST(label AS BIGINT) AS label,
           COUNT(*) AS community_size,
           CAST(MIN(n) AS BIGINT) AS min_member,
           CAST(MAX(n) AS BIGINT) AS max_member
    FROM l{rounds} GROUP BY label"""
    )


ORACLES["label_propagation"] = _label_propagation_oracle()
QUERIES["label_propagation"] = q_label_propagation


def q_bfs_hops(spark, sf):
    """Fixed-horizon breadth-first search — the graph-TRAVERSAL family
    beside connectivity (dedup_clusters), centrality (pagerank), density
    (k_core), counting (triangle_count), and community
    (label_propagation). Single source = the smallest part id in the
    sparsified co-purchase graph (same <=3-distinct-parts-per-order graph
    as label_propagation); exactly 4 synchronized expansion rounds, so
    the result is the hop-distance histogram over the 4-hop ball:
    per hop, node count and min/max node. ``bfs_distances`` expands only
    the FRONTIER each round (nodes first reached last round), so the
    per-round join is frontier-sized, not ball-sized, and newly-reached
    nodes are an anti-join against the settled set — BFS distances are
    final on first touch, so no min-merge over the whole ball is ever
    needed (commit af4c16b; results identical to the full-merge form).
    The oracle replays the same 4 rounds as MATERIALIZED min-merge CTEs —
    same fixpoint, SQL-expressible."""
    from batch_processing_pipeline_spark.operators.graph_iter import (
        bfs_distances,
    )

    edges = _copurchase_graph(spark, sf)
    dist = bfs_distances(edges, max_hops=4)
    edges.unpersist()
    return (
        dist.groupBy("d")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.min("n").alias("min_node"),
            F.max("n").alias("max_node"),
        )
        .select(
            F.col("d").cast("long").alias("hop"),
            "n_nodes",
            F.col("min_node").cast("long").alias("min_node"),
            F.col("max_node").cast("long").alias("max_node"),
        )
    )


def _bfs_hops_oracle(rounds: int = 4) -> str:
    parts = _copurchase_graph_ctes() + [
        "d0 AS MATERIALIZED (SELECT MIN(u) AS n, 0 AS d FROM bidir)",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"d{i} AS MATERIALIZED (SELECT n, MIN(d) AS d FROM ("
            f" SELECT n, d FROM d{i-1}"
            f" UNION ALL SELECT b.u, x.d + 1 FROM bidir b JOIN d{i-1} x ON x.n = b.v"
            f") GROUP BY n)"
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
    SELECT CAST(d AS BIGINT) AS hop, COUNT(*) AS n_nodes,
           CAST(MIN(n) AS BIGINT) AS min_node,
           CAST(MAX(n) AS BIGINT) AS max_node
    FROM d{rounds} GROUP BY d"""
    )


ORACLES["bfs_hops"] = _bfs_hops_oracle()
QUERIES["bfs_hops"] = q_bfs_hops


_SURV_PRICE = 450000  # ~63% of customers event at every fixture scale
_SURV_BUCKET_DAYS = 90


def q_survival_curve(spark, sf):
    """Nelson-Aalen survival analysis — censored time-to-event, the one
    product-analytics family the registry lacked. Subject = customer;
    origin = first order date; event = first order above
    _SURV_PRICE (the 'time to first high-value order' question);
    censored at the last observed order if it never happens (~37% of
    customers at every fixture scale). Durations bucket to 90-day
    intervals; per bucket the estimator needs n_risk (subjects still
    under observation), n_events, and the cumulative hazard
    H(t) = sum d_i/n_i, with S(t) = exp(-H) — the additive Nelson-Aalen
    form rather than the Kaplan-Meier product, so there is no log-of-
    zero edge case when a bucket's events exhaust its risk set. Shape:
    one groupBy(customer) over the fact, then pure window math on the
    27-row bucket relation — the fact never shuffles twice, and the
    unpartitioned windows run on a dimension-sized relation (the
    eval_stats discipline). Oracle: identical bucket aggregation and
    ordered window sums, so the IEEE accumulation order is pinned."""
    per = (
        _t(spark, sf, "orders")
        .groupBy("o_custkey")
        .agg(
            F.min("o_orderdate").alias("first_d"),
            F.max("o_orderdate").alias("last_d"),
            F.min(
                F.when(
                    F.col("o_totalprice") > _SURV_PRICE, F.col("o_orderdate")
                )
            ).alias("ev_d"),
        )
        .select(
            F.floor(
                F.datediff(F.coalesce("ev_d", "last_d"), F.col("first_d"))
                / F.lit(float(_SURV_BUCKET_DAYS))
            )
            .cast("int")
            .alias("bucket"),
            F.col("ev_d").isNotNull().alias("is_event"),
        )
    )
    b = per.groupBy("bucket").agg(
        F.sum(F.when(F.col("is_event"), 1).otherwise(0)).alias("n_events"),
        F.sum(F.when(F.col("is_event"), 0).otherwise(1)).alias("n_censored"),
    )
    w_risk = Window.orderBy("bucket").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    w_cum = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    r = b.withColumn(
        "n_risk", F.sum(F.col("n_events") + F.col("n_censored")).over(w_risk)
    )
    hazard = F.col("n_events").cast("double") / F.col("n_risk")
    return r.select(
        F.col("bucket").cast("long").alias("bucket"),
        F.col("n_risk").cast("long").alias("n_risk"),
        "n_events",
        "n_censored",
        round4(F.sum(hazard).over(w_cum)).alias("cum_hazard"),
        round4(F.exp(-F.sum(hazard).over(w_cum))).alias("survival"),
    )


_SURV_EV = f"MIN(CASE WHEN o_totalprice > {_SURV_PRICE} THEN o_orderdate END)"
ORACLES["survival_curve"] = f"""
    WITH per AS MATERIALIZED (
      SELECT CAST(FLOOR(DATE_DIFF('day', MIN(o_orderdate),
                                  COALESCE({_SURV_EV}, MAX(o_orderdate)))
                        / {float(_SURV_BUCKET_DAYS)}) AS INT) AS bucket,
             ({_SURV_EV} IS NOT NULL) AS is_event
      FROM orders GROUP BY o_custkey),
    b AS MATERIALIZED (
      SELECT bucket,
             SUM(CASE WHEN is_event THEN 1 ELSE 0 END) AS n_events,
             SUM(CASE WHEN is_event THEN 0 ELSE 1 END) AS n_censored
      FROM per GROUP BY bucket),
    r AS MATERIALIZED (
      SELECT bucket, n_events, n_censored,
             SUM(n_events + n_censored) OVER (
               ORDER BY bucket ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
             ) AS n_risk
      FROM b)
    SELECT CAST(bucket AS BIGINT) AS bucket, CAST(n_risk AS BIGINT) AS n_risk,
           CAST(n_events AS BIGINT) AS n_events,
           CAST(n_censored AS BIGINT) AS n_censored,
           {R("SUM(CAST(n_events AS DOUBLE)/n_risk) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")} AS cum_hazard,
           {R("EXP(-SUM(CAST(n_events AS DOUBLE)/n_risk) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))")} AS survival
    FROM r
"""
QUERIES["survival_curve"] = q_survival_curve
