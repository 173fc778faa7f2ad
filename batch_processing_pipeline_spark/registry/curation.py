"""Registry section: training-data curation: deterministic sampling, domain mixing, PII scrub, corpus n-gram statistics.

Split from the former single-file registry (round 7); registers its
queries into the shared ``QUERIES``/``ORACLES`` dicts at import time.
"""

from __future__ import annotations

from batch_processing_pipeline_spark.registry._base import (  # noqa: F401
    F,
    ORACLES,
    QUERIES,
    _t,
    round4,
    sql_round4,
)

# --------------------------------------------------------------------------
# Training-data curation: deterministic sampling, domain mixing, PII scrub,
# corpus n-gram statistics. All decisions hash-keyed (operators/sampling.py)
# so the DuckDB twin verifies the kept SETS row-for-row, not statistically.
# --------------------------------------------------------------------------
from batch_processing_pipeline_spark.functions.pii import scrub_pii, sql_scrub_pii
from batch_processing_pipeline_spark.functions.text_analysis import word_ngram_counts
from batch_processing_pipeline_spark.operators.sampling import (
    assign_split,
    deterministic_sample,
    domain_mix,
    hex_threshold,
    stratified_sample,
)


def q_sample_hash(spark, sf):
    """30% uniform sample, decided per-row by md5(key) threshold — no RNG,
    no shuffle; kept set is engine-exact and nested under larger fractions."""
    d = _t(spark, sf, "documents")
    return deterministic_sample(d, 0.3, "doc_id", seed="s1").select("doc_id", "lang")


_STRATA_FRACTIONS = {"en": 0.5, "de": 1.0, "zh": 0.2}


def q_sample_stratified(spark, sf):
    """Per-language sampling fractions in one map-side CASE filter; strata
    outside the plan (es, fr) drop entirely."""
    d = _t(spark, sf, "documents")
    return stratified_sample(
        d, _STRATA_FRACTIONS, strata_col="lang", key_col="doc_id", seed="st"
    ).select("doc_id", "lang")


_SPLIT_WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}


def q_split_assign(spark, sf):
    """Leak-free train/val/test assignment by cumulative hash thresholds;
    aggregated per (split, lang) so the compared result is small + stable."""
    d = _t(spark, sf, "documents")
    s = assign_split(d, _SPLIT_WEIGHTS, key_col="doc_id", seed="sp")
    return s.groupBy("split", "lang").agg(F.count(F.lit(1)).alias("n"))


_MIX_TARGET = {"src0": 0.5, "src1": 0.3, "src2": 0.2}


def q_domain_mix(spark, sf):
    """Downsample to the largest corpus hitting a 50/30/20 source mixture;
    per-domain keep fractions derive from corpus counts inside the query."""
    d = _t(spark, sf, "documents")
    return domain_mix(
        d, _MIX_TARGET, domain_col="source", key_col="doc_id", seed="mix"
    ).select("doc_id", "source")


def q_pii_scrub(spark, sf):
    """Scrub synthesized PII (email/IP/phone appended per doc) to <TAG>
    placeholders — regexp_replace chain, codegen'd, shuffle-free."""
    d = _t(spark, sf, "documents")
    synth = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com from 10."),
        (F.col("doc_id") % 200).cast("string"),
        F.lit(".0.7 call +1 (555) 010-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    return d.select("doc_id", scrub_pii(synth).alias("scrubbed"))


def q_top_bigrams(spark, sf):
    """Corpus-wide top-50 word bigrams (map-side-combined count, total-order
    deterministic LIMIT)."""
    return word_ngram_counts(_t(spark, sf, "documents"), "text", n=2, k=50)


def _split_case_sql() -> str:
    """The oracle's CASE ladder, thresholds accumulated EXACTLY as
    assign_split accumulates them (same float-addition order)."""
    total = sum(_SPLIT_WEIGHTS.values())
    names = list(_SPLIT_WEIGHTS)
    acc = 0.0
    branches = []
    for name in names[:-1]:
        acc += _SPLIT_WEIGHTS[name] / total
        branches.append(
            "WHEN substr(md5('sp:' || CAST(doc_id AS VARCHAR)), 1, 8)"
            f" < '{hex_threshold(acc)}' THEN '{name}'"
        )
    return "CASE " + " ".join(branches) + f" ELSE '{names[-1]}' END"


def _mix_values_sql() -> str:
    total = sum(_MIX_TARGET.values())
    return ", ".join(f"('{d}', {p / total!r})" for d, p in _MIX_TARGET.items())


ORACLES.update(
    {
        "sample_hash": f"""
            SELECT doc_id, lang FROM documents
            WHERE substr(md5('s1:' || CAST(doc_id AS VARCHAR)), 1, 8)
                  < '{hex_threshold(0.3)}'
        """,
        "sample_stratified": f"""
            SELECT doc_id, lang FROM documents
            WHERE (lang = 'de')
               OR (lang = 'en' AND substr(md5('st:' || CAST(doc_id AS VARCHAR)), 1, 8)
                   < '{hex_threshold(_STRATA_FRACTIONS["en"])}')
               OR (lang = 'zh' AND substr(md5('st:' || CAST(doc_id AS VARCHAR)), 1, 8)
                   < '{hex_threshold(_STRATA_FRACTIONS["zh"])}')
        """,
        "split_assign": f"""
            SELECT {_split_case_sql()} AS split, lang, COUNT(*) AS n
            FROM documents GROUP BY 1, 2
        """,
        "domain_mix": f"""
            WITH cnt AS (SELECT source, COUNT(*) AS c FROM documents GROUP BY source),
                 tgt(source, p) AS (VALUES {_mix_values_sql()}),
                 j AS (SELECT cnt.source, cnt.c, tgt.p FROM cnt JOIN tgt USING (source)),
                 s AS (SELECT MIN(c / p) AS nstar FROM j),
                 fr AS (SELECT j.source,
                               printf('%08x', LEAST(CAST(FLOOR(j.p * s.nstar / j.c * 4294967296.0) AS BIGINT),
                                                    4294967295)) AS thr
                        FROM j CROSS JOIN s)
            SELECT d.doc_id, d.source
            FROM documents d JOIN fr ON d.source = fr.source
            WHERE substr(md5('mix:' || CAST(d.doc_id AS VARCHAR)), 1, 8) < fr.thr
        """,
        "pii_scrub": f"""
            SELECT doc_id,
                   {sql_scrub_pii(
                       "text || ' contact user' || CAST(doc_id AS VARCHAR)"
                       " || '@example.com from 10.' || CAST(doc_id % 200 AS VARCHAR)"
                       " || '.0.7 call +1 (555) 010-'"
                       " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
                   )} AS scrubbed
            FROM documents
        """,
        "top_bigrams": r"""
            WITH d AS (SELECT lower(trim(text)) AS s FROM documents
                       WHERE length(trim(text)) > 0),
                 tk AS (SELECT string_split_regex(s, '\s+') AS t FROM d),
                 p AS (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
                       FROM tk WHERE len(t) >= 2),
                 g AS (SELECT t[i] || ' ' || t[i + 1] AS ngram FROM p)
            SELECT ngram, COUNT(*) AS n_occurrences FROM g GROUP BY ngram
            ORDER BY n_occurrences DESC, md5(ngram) LIMIT 50
        """,
    }
)

QUERIES.update(
    {
        "sample_hash": q_sample_hash,
        "sample_stratified": q_sample_stratified,
        "split_assign": q_split_assign,
        "domain_mix": q_domain_mix,
        "pii_scrub": q_pii_scrub,
        "top_bigrams": q_top_bigrams,
    }
)


from batch_processing_pipeline_spark.operators.sampling import cap_per_group


def q_cap_per_group(spark, sf):
    """Uniform, reproducible cap of 10 docs per source (two-phase
    WindowGroupLimit — map-side top-k before the shuffle)."""
    d = _t(spark, sf, "documents")
    return cap_per_group(d, 10, group_col="source", key_col="doc_id").select(
        "doc_id", "source"
    )


ORACLES["cap_per_group"] = """
    SELECT doc_id, source FROM (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY substr(md5('cap:' || CAST(doc_id AS VARCHAR)), 1, 8),
                            doc_id) AS rk
        FROM documents) t
    WHERE rk <= 10
"""
QUERIES["cap_per_group"] = q_cap_per_group


from batch_processing_pipeline_spark.functions.text_analysis import repetition_stats


def q_text_repetition(spark, sf):
    """Gopher-style repetition metrics per document (duplicate word/bigram
    share) — explode + map-side-combining count/count-distinct, no HOFs."""
    return repetition_stats(_t(spark, sf, "documents"))


ORACLES["text_repetition"] = rf"""
    WITH d AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
               FROM documents WHERE length(trim(text)) > 0),
         w AS (SELECT doc_id, len(t) AS nw, len(list_distinct(t)) AS ndw FROM d),
         b AS (SELECT doc_id,
                      [t[i] || ' ' || t[i+1] FOR i IN generate_series(1, len(t)-1)] AS bg
               FROM d WHERE len(t) >= 2),
         b2 AS (SELECT doc_id, len(bg) AS nb, len(list_distinct(bg)) AS ndb FROM b)
    SELECT w.doc_id, CAST(w.nw AS BIGINT) AS n_words,
           {sql_round4("1.0 - CAST(w.ndw AS DOUBLE) / CAST(w.nw AS DOUBLE)")} AS dup_word_ratio,
           COALESCE({sql_round4("1.0 - CAST(b2.ndb AS DOUBLE) / CAST(b2.nb AS DOUBLE)")}, 0.0) AS dup_bigram_ratio
    FROM w LEFT JOIN b2 USING (doc_id)
"""
QUERIES["text_repetition"] = q_text_repetition


def q_histogram(spark, sf):
    """Fixed-width histogram of document length (corpus reporting): one
    map-side bucket projection + a map-side-combining count — the shape
    that profiles a 100 TB column in a single pass."""
    d = _t(spark, sf, "documents")
    width, nbuckets = 50.0, 10
    bucket = F.least(
        F.floor(F.col("n_chars").cast("double") / F.lit(width)),
        F.lit(nbuckets - 1),
    ).cast("long")
    return (
        d.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bucket",
            (F.col("bucket") * F.lit(50)).cast("long").alias("lo"),
            ((F.col("bucket") + 1) * F.lit(50)).cast("long").alias("hi"),
            "n",
        )
    )


ORACLES["histogram"] = """
    SELECT bucket, CAST(bucket * 50 AS BIGINT) AS lo,
           CAST((bucket + 1) * 50 AS BIGINT) AS hi, COUNT(*) AS n
    FROM (SELECT CAST(LEAST(FLOOR(CAST(n_chars AS DOUBLE) / 50.0), 9) AS BIGINT) AS bucket
          FROM documents) t
    GROUP BY bucket
"""
QUERIES["histogram"] = q_histogram


def q_profile(spark, sf):
    """Per-column profiling summary (SUMMARIZE-style corpus accounting):
    one aggregation pass computes count/distinct/null/min/max for several
    columns at once — no per-column scans."""
    d = _t(spark, sf, "documents")
    row = d.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("lang").alias("lang_distinct"),
        F.sum(F.when(F.col("lang").isNull(), 1).otherwise(0)).alias("lang_nulls"),
        F.min("n_chars").alias("n_chars_min"),
        F.max("n_chars").alias("n_chars_max"),
        F.countDistinct("source").alias("source_distinct"),
        F.min("doc_id").alias("doc_id_min"),
        F.max("doc_id").alias("doc_id_max"),
    )
    return row


ORACLES["profile"] = """
    SELECT COUNT(*) AS n_rows,
           COUNT(DISTINCT lang) AS lang_distinct,
           CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS lang_nulls,
           MIN(n_chars) AS n_chars_min,
           MAX(n_chars) AS n_chars_max,
           COUNT(DISTINCT source) AS source_distinct,
           MIN(doc_id) AS doc_id_min,
           MAX(doc_id) AS doc_id_max
    FROM documents
"""
QUERIES["profile"] = q_profile




def q_split_leakage(spark, sf):
    """Train/test split LEAKAGE audit — the check every eval pipeline
    must run when splits hash on the document ID: near-duplicate content
    landing on both sides of a split boundary leaks eval answers into
    training. The content key is the md5 of the first 8 whitespace
    tokens — the boilerplate/template prefix key, which is how template
    families actually leak (the fixture, like real web text, has no
    byte-exact dups but plenty of shared-prefix families). One row per
    split pair with the number of leaking keys and the document mass on
    each side; a content-keyed split (or dedup-before-split) drives this
    to zero, which is exactly what this readout argues for. Digest-only
    shuffles (16 B/doc), one self-join on the key of the distinct
    (key, split) relation."""
    d = _t(spark, sf, "documents")
    fp = F.md5(
        F.concat_ws(
            " ", F.slice(F.split(F.lower(F.trim(F.col("text"))), r"\s+"), 1, 8)
        )
    )
    s = assign_split(d, _SPLIT_WEIGHTS, key_col="doc_id", seed="sp").select(
        fp.alias("fp"), "split"
    )
    per = s.groupBy("fp", "split").agg(F.count(F.lit(1)).alias("n_docs"))
    a, b = per.alias("a"), per.alias("b")
    pairs = a.join(
        b,
        (F.col("a.fp") == F.col("b.fp")) & (F.col("a.split") < F.col("b.split")),
    )
    return (
        pairs.groupBy(
            F.col("a.split").alias("split_a"), F.col("b.split").alias("split_b")
        )
        .agg(
            F.count(F.lit(1)).alias("n_fingerprints"),
            F.sum("a.n_docs").alias("docs_a"),
            F.sum("b.n_docs").alias("docs_b"),
        )
    )


def q_dedup_cluster_stats(spark, sf):
    """Duplicate-cluster SIZE distribution — the shape report a dedup
    run is judged by (how much mass sits in how-big clusters): content
    keys (md5 of the first 8 normalized tokens — the boilerplate/
    template prefix key; see split_leakage for why) bucketed by cluster
    size, with cluster count, document mass, and corpus share per size.
    Two aggregations over digests."""
    d = _t(spark, sf, "documents")
    fp = F.md5(
        F.concat_ws(
            " ", F.slice(F.split(F.lower(F.trim(F.col("text"))), r"\s+"), 1, 8)
        )
    )
    sizes = (
        d.select(fp.alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("cluster_size"))
    )
    total = d.count()
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters")).alias("n_docs"),
            round4(
                (F.col("cluster_size") * F.col("n_clusters")).cast("double")
                / F.lit(float(total))
            ).alias("corpus_share"),
        )
    )


ORACLES.update(
    {
        "split_leakage": f"""
            WITH s AS (
              SELECT md5(array_to_string(regexp_split_to_array(lower(trim(text)), '\\s+')[1:8], ' ')) AS fp, {_split_case_sql()} AS split
              FROM documents
            ), per AS (
              SELECT fp, split, COUNT(*) AS n_docs FROM s GROUP BY fp, split
            )
            SELECT a.split AS split_a, b.split AS split_b,
                   COUNT(*) AS n_fingerprints,
                   CAST(SUM(a.n_docs) AS BIGINT) AS docs_a,
                   CAST(SUM(b.n_docs) AS BIGINT) AS docs_b
            FROM per a JOIN per b ON a.fp = b.fp AND a.split < b.split
            GROUP BY a.split, b.split
        """,
        "dedup_cluster_stats": f"""
            WITH sizes AS (
              SELECT md5(array_to_string(regexp_split_to_array(lower(trim(text)), '\\s+')[1:8], ' ')) AS fp, COUNT(*) AS cluster_size
              FROM documents GROUP BY fp
            ), tot AS (SELECT COUNT(*) AS n FROM documents)
            SELECT cluster_size,
                   COUNT(*) AS n_clusters,
                   cluster_size * COUNT(*) AS n_docs,
                   {sql_round4("CAST(cluster_size * COUNT(*) AS DOUBLE) / CAST(tot.n AS DOUBLE)")}
                     AS corpus_share
            FROM sizes CROSS JOIN tot
            GROUP BY cluster_size, tot.n
        """,
    }
)
QUERIES.update(
    {
        "split_leakage": q_split_leakage,
        "dedup_cluster_stats": q_dedup_cluster_stats,
    }
)


# --------------------------------------------------------------------------
# Round 11: the web-scrape cleaning gate as an oracle-checked query.
# clean_text (functions/text_analysis.py) is the composed pre-dedup
# canonicalizer — markup strip, entity decode/neutralize, invisible strip,
# whitespace collapse — redesigned this round as a TRUE fixpoint (re-running
# the gate never changes a fingerprint; see the r10 advice). The query runs
# it over every document and reports the cleaned text plus the character delta,
# the operational signal a curation run monitors (how much boilerplate the
# gate removes per shard). Scale shape: a pure per-row codegen regexp chain,
# zero shuffles — the plan is Scan -> Project at any corpus size.
# --------------------------------------------------------------------------
from batch_processing_pipeline_spark.functions.text_analysis import (
    clean_text,
    sql_clean_text,
)


def q_clean_text(spark, sf):
    d = _t(spark, sf, "documents")
    return d.select(
        "doc_id",
        clean_text(F.col("text")).alias("clean"),
        (F.length("text") - F.length(clean_text(F.col("text"))))
        .cast("long")
        .alias("chars_removed"),
    )


ORACLES["clean_text"] = f"""
    SELECT doc_id,
           {sql_clean_text('text')} AS clean,
           length(text) - length({sql_clean_text('text')}) AS chars_removed
    FROM documents
"""
QUERIES["clean_text"] = q_clean_text


# --------------------------------------------------------------------------
# Round 11 (second slot): the CDC hop as an oracle-checked batch query.
# diff_suggestions (plans/autocomplete.py) is what collapses the reference's
# MySQL -> Debezium -> Kafka Connect chain (reference README.md:31-41,
# docker-compose.yml:126-184) into two anti-joins over (key, payload)
# projections; until now it was exercised only inside the streaming serving
# pipeline (rows pinned in tests/test_streaming.py), with no driver
# CORRECTNESS row. The query builds TWO deterministic suggestion snapshots
# (the dq28 pipeline over the even-doc_id half vs the odd-doc_id half of the
# corpus) and diffs them, so BOTH publish verbs occur: prefixes whose top-3
# payload differs across the halves emit 'upsert'; prefixes present only in
# the even half emit 'delete' (payload NULL) — the Redis DEL / Kafka
# tombstone path. Scale shape: two partial-aggregated prefix rollups, a
# WindowGroupLimit top-k each, then anti-joins that shuffle only
# (prefix, payload-string) — never the corpus; no cartesian, no Python.
# --------------------------------------------------------------------------
from batch_processing_pipeline_spark.operators.topk import (
    ordered_collect,
    top_k_per_group,
)
from batch_processing_pipeline_spark.plans.autocomplete import diff_suggestions


def _suggestion_snapshot(docs):
    """documents -> (prefix, completions) via the dq28 pipeline; the payload
    is the rank-ordered 'query:frequency' list joined with '|' — the exact
    serving-row digest the delta publish keys on."""
    from batch_processing_pipeline_spark.operators.prefix import (
        normalize_queries,
        prefix_frequencies,
    )

    freq = prefix_frequencies(
        normalize_queries(docs, text_col="text"), max_len=8
    )
    ranked = top_k_per_group(
        freq,
        group_cols=["prefix"],
        order_by=[F.desc("frequency"), F.asc("query")],
        k=3,
    ).withColumn(
        "entry", F.concat_ws(":", F.col("query"), F.col("frequency"))
    )
    return ordered_collect(
        ranked, ["prefix"], rank_col="rk", value_col="entry"
    ).select("prefix", F.concat_ws("|", "completions").alias("completions"))


def q_serving_delta(spark, sf):
    d = _t(spark, sf, "documents")
    prev = _suggestion_snapshot(d.where(F.col("doc_id") % 2 == 0))
    cur = _suggestion_snapshot(d.where(F.col("doc_id") % 2 == 1))
    return diff_suggestions(
        prev, cur, key_col="prefix", payload_col="completions"
    )


ORACLES["serving_delta"] = """
    WITH q AS (
      SELECT doc_id % 2 AS side,
             substring(lower(trim(text)), 1, 500) AS query
      FROM documents
      WHERE text IS NOT NULL AND length(trim(text)) >= 2
    ), pairs AS (
      SELECT side, substring(query, 1, k.k) AS prefix, query
      FROM q CROSS JOIN (VALUES (2),(3),(4),(5),(6),(7),(8)) AS k(k)
      WHERE length(query) >= k.k
    ), freq AS (
      SELECT side, prefix, query, COUNT(*) AS frequency
      FROM pairs GROUP BY side, prefix, query
    ), ranked AS (
      SELECT side, prefix, query, frequency,
             ROW_NUMBER() OVER (PARTITION BY side, prefix
                                ORDER BY frequency DESC, query ASC) AS rk
      FROM freq
    ), snap AS (
      SELECT side, prefix,
             string_agg(query || ':' || frequency, '|'
                        ORDER BY rk ASC) AS completions
      FROM ranked WHERE rk <= 3 GROUP BY side, prefix
    ), prev AS (SELECT prefix, completions FROM snap WHERE side = 0),
       cur  AS (SELECT prefix, completions FROM snap WHERE side = 1)
    SELECT cur.prefix AS prefix, cur.completions AS completions,
           'upsert' AS op
    FROM cur LEFT JOIN prev
      ON cur.prefix = prev.prefix AND cur.completions = prev.completions
    WHERE prev.prefix IS NULL
    UNION ALL
    SELECT prev.prefix AS prefix, CAST(NULL AS VARCHAR) AS completions,
           'delete' AS op
    FROM prev LEFT JOIN cur ON prev.prefix = cur.prefix
    WHERE cur.prefix IS NULL
"""
QUERIES["serving_delta"] = q_serving_delta
