"""Registry section: SQL-surface widening: subqueries, null-safe joins, window frames, regexp, filtered aggregates, time series.

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
    bpe_ish_token_count,
    ngram_jaccard_pairs,
    round4,
)
from batch_processing_pipeline_spark.registry.core import _JACC  # noqa: F401

# --------------------------------------------------------------------------
# round 2: SQL-surface widening — subqueries, null-safe join, window frames,
# regexp extraction, filtered aggregates
def q_exists_subquery(spark, sf):
    """Correlated EXISTS + NOT EXISTS through the SQL entry point (Catalyst
    rewrites both to semi/anti joins — no per-row subquery execution)."""
    _t(spark, sf, "customer").createOrReplaceTempView("customer")
    _t(spark, sf, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > CAST(150000.0 AS DOUBLE))
          AND NOT EXISTS (SELECT 1 FROM orders o2
                          WHERE o2.o_custkey = c.c_custkey
                            AND o2.o_orderstatus = 'F'
                            AND o2.o_totalprice < CAST(5000.0 AS DOUBLE))
        """
    )


ORACLES["exists_subquery"] = """
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000.0)
      AND NOT EXISTS (SELECT 1 FROM orders o2
                      WHERE o2.o_custkey = c.c_custkey
                        AND o2.o_orderstatus = 'F' AND o2.o_totalprice < 5000.0)
"""
QUERIES["exists_subquery"] = q_exists_subquery


def q_scalar_subquery(spark, sf):
    """Uncorrelated scalar subquery in a predicate (single-row broadcast)."""
    _t(spark, sf, "part").createOrReplaceTempView("part")
    return spark.sql(
        """
        SELECT p_partkey, p_retailprice
        FROM part
        WHERE p_retailprice > (SELECT AVG(p_retailprice) FROM part)
        """
    )


ORACLES["scalar_subquery"] = """
    SELECT p_partkey, p_retailprice
    FROM part
    WHERE p_retailprice > (SELECT AVG(p_retailprice) FROM part)
"""
QUERIES["scalar_subquery"] = q_scalar_subquery


def q_null_safe_join(spark, sf):
    """Null-safe equality join (``eqNullSafe`` / IS NOT DISTINCT FROM):
    null keys pair with null keys instead of vanishing from the result."""
    o = _t(spark, sf, "orders")
    a = o.select(
        F.when(F.col("o_orderkey") % 7 == 0, F.lit(None))
        .otherwise(F.col("o_orderkey") % 5)
        .cast("long")
        .alias("ka")
    )
    b = (
        o.select(
            F.when(F.col("o_orderkey") % 11 == 0, F.lit(None))
            .otherwise(F.col("o_orderkey") % 5)
            .cast("long")
            .alias("kb")
        )
        .groupBy("kb")
        .agg(F.count(F.lit(1)).alias("nb"))
    )
    return (
        a.join(b, a["ka"].eqNullSafe(b["kb"]))
        .groupBy("ka")
        .agg(F.count(F.lit(1)).alias("n"), F.max("nb").alias("nb"))
        .select(F.col("ka").alias("k"), "n", "nb")
    )


ORACLES["null_safe_join"] = """
    WITH a AS (
      SELECT CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderkey % 5 END AS ka
      FROM orders
    ), b AS (
      SELECT CASE WHEN o_orderkey % 11 = 0 THEN NULL ELSE o_orderkey % 5 END AS kb,
             COUNT(*) AS nb
      FROM orders GROUP BY 1
    )
    SELECT a.ka AS k, COUNT(*) AS n, MAX(b.nb) AS nb
    FROM a JOIN b ON a.ka IS NOT DISTINCT FROM b.kb
    GROUP BY a.ka
"""
QUERIES["null_safe_join"] = q_null_safe_join


def q_window_frames(spark, sf):
    """Explicit ROWS frame: moving sum/avg over the trailing 3 orders per
    customer (deterministic order on the unique key)."""
    o = _t(spark, sf, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderkey"))
        .rowsBetween(-2, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        # exact cents inside the frame (r12 sweep): Spark re-sums the
        # sliding frame in row order while DuckDB's segment tree can
        # associate differently — integers are order-free
        round4(F.sum(cents(F.col("o_totalprice"))).over(w) / F.lit(100.0)).alias("mov_sum"),
        round4(
            F.sum(cents(F.col("o_totalprice"))).over(w)
            / (F.lit(100.0) * F.count(F.lit(1)).over(w))
        ).alias("mov_avg"),
    )


ORACLES["window_frames"] = f"""
    SELECT o_custkey, o_orderkey,
           {R(f"SUM({sql_cents('o_totalprice')}) OVER w / CAST(100.0 AS DOUBLE)")} AS mov_sum,
           {R(f"SUM({sql_cents('o_totalprice')}) OVER w / (CAST(100.0 AS DOUBLE) * COUNT(*) OVER w)")} AS mov_avg
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey ASC
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
"""
QUERIES["window_frames"] = q_window_frames


def q_regexp_extract_all(spark, sf):
    """regexp_extract_all: every digit run per document as array<string>."""
    d = _t(spark, sf, "documents")
    # nums is projected via to_json: the driver's pandas canonicalizer
    # cannot sort/hash list cells, and JSON round-trips to the oracle
    return d.select(
        "doc_id",
        F.to_json(F.regexp_extract_all(F.col("text"), F.lit(r"\d+"), 0)).alias(
            "nums"
        ),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"\d+"), 0))
        .cast("long")
        .alias("n_nums"),
    )


ORACLES["regexp_extract_all"] = r"""
    SELECT doc_id,
           CAST(to_json(regexp_extract_all(text, '\d+', 0)) AS VARCHAR) AS nums,
           CAST(length(regexp_extract_all(text, '\d+', 0)) AS BIGINT) AS n_nums
    FROM documents
"""
QUERIES["regexp_extract_all"] = q_regexp_extract_all


def q_filtered_aggs(spark, sf):
    """Conditional aggregation (FILTER clause / count_if surface): the
    predicates fold into the aggregate buffers — one pass, map-side
    combining, no per-branch scans."""
    o = _t(spark, sf, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count(F.when(F.col("o_totalprice") > 150000.0, 1)).alias("n_big"),
        round4(
            F.sum(
                F.when(
                    F.col("o_orderpriority") == "1-URGENT",
                    cents(F.col("o_totalprice")),
                )
            )
            / F.lit(100.0)
        ).alias("sum_urgent"),
        F.count(F.lit(1)).alias("n"),
    )


ORACLES["filtered_aggs"] = f"""
    SELECT o_orderstatus,
           COUNT(*) FILTER (WHERE o_totalprice > 150000.0) AS n_big,
           {R(f"SUM({sql_cents('o_totalprice')}) FILTER (WHERE o_orderpriority = '1-URGENT') / CAST(100.0 AS DOUBLE)")}
               AS sum_urgent,
           COUNT(*) AS n
    FROM orders GROUP BY o_orderstatus
"""
QUERIES["filtered_aggs"] = q_filtered_aggs


def q_decontaminate(spark, sf):
    """Benchmark decontamination: docs with doc_id % 97 == 0 play the eval
    set; surviving corpus docs share no 24-char-gram with any of them. The
    benchmark side is a broadcast set of shingle hashes — the corpus text
    is probed map-side and never shuffles."""
    from batch_processing_pipeline_spark.operators.decontaminate import decontaminate

    d = _t(spark, sf, "documents").select("doc_id", "text")
    bench = d.where(F.col("doc_id") % 97 == 0)
    corpus = d.where(F.col("doc_id") % 97 != 0)
    return decontaminate(corpus, bench, ngram=24).select("doc_id")


ORACLES["decontaminate"] = """
    WITH bench AS (
      SELECT DISTINCT unnest(list_transform(
               range(1, length(lower(trim(text))) - 22),
               i -> substr(lower(trim(text)), CAST(i AS INTEGER), 24))) AS g
      FROM documents
      WHERE doc_id % 97 = 0 AND length(lower(trim(text))) >= 24
    ), corp AS (
      SELECT doc_id, lower(trim(text)) AS t FROM documents WHERE doc_id % 97 <> 0
    ), corp_g AS (
      SELECT doc_id, unnest(list_transform(
               range(1, length(t) - 22),
               i -> substr(t, CAST(i AS INTEGER), 24))) AS g
      FROM corp WHERE length(t) >= 24
    ), contaminated AS (
      SELECT DISTINCT doc_id FROM corp_g WHERE g IN (SELECT g FROM bench)
    )
    SELECT doc_id FROM corp
    WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
"""
QUERIES["decontaminate"] = q_decontaminate


def q_contamination_report(spark, sf):
    """Audit view of decontamination: distinct shared 24-gram hash count per
    contaminated document."""
    from batch_processing_pipeline_spark.operators.decontaminate import (
        contamination_report,
    )

    d = _t(spark, sf, "documents").select("doc_id", "text")
    bench = d.where(F.col("doc_id") % 97 == 0)
    corpus = d.where(F.col("doc_id") % 97 != 0)
    return contamination_report(corpus, bench, ngram=24)


ORACLES["contamination_report"] = """
    WITH bench AS (
      SELECT DISTINCT unnest(list_transform(
               range(1, length(lower(trim(text))) - 22),
               i -> substr(lower(trim(text)), CAST(i AS INTEGER), 24))) AS g
      FROM documents
      WHERE doc_id % 97 = 0 AND length(lower(trim(text))) >= 24
    ), corp AS (
      SELECT doc_id, lower(trim(text)) AS t FROM documents WHERE doc_id % 97 <> 0
    ), hits AS (
      SELECT DISTINCT doc_id, g FROM (
        SELECT doc_id, unnest(list_transform(
                 range(1, length(t) - 22),
                 i -> substr(t, CAST(i AS INTEGER), 24))) AS g
        FROM corp WHERE length(t) >= 24
      ) WHERE g IN (SELECT g FROM bench)
    )
    SELECT doc_id, COUNT(*) AS n_hits FROM hits GROUP BY doc_id
"""
QUERIES["contamination_report"] = q_contamination_report


def q_length_buckets(spark, sf):
    """Token-length bucketing for training-batch packing: power-of-2 bucket
    of the BPE-ish token count, with per-bucket volume stats — a single
    map-side projection + map-side-combining aggregate."""
    d = _t(spark, sf, "documents")
    toks = bpe_ish_token_count(F.col("text"))
    bucket = F.when(toks <= 0, F.lit(0)).otherwise(
        F.floor(F.log2(toks.cast("double"))) + 1
    ).cast("long")
    return (
        d.select(bucket.alias("len_bucket"), toks.alias("_t"))
        .groupBy("len_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_t").cast("long").alias("total_tokens"),
            F.min("_t").cast("long").alias("min_tokens"),
            F.max("_t").cast("long").alias("max_tokens"),
        )
    )


ORACLES["length_buckets"] = r"""
    WITH t AS (
      SELECT CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]'))
                  AS BIGINT) AS toks
      FROM documents
    )
    SELECT CASE WHEN toks <= 0 THEN 0
                ELSE CAST(FLOOR(log2(CAST(toks AS DOUBLE))) + 1 AS BIGINT) END
               AS len_bucket,
           COUNT(*) AS n_docs,
           CAST(SUM(toks) AS BIGINT) AS total_tokens,
           CAST(MIN(toks) AS BIGINT) AS min_tokens,
           CAST(MAX(toks) AS BIGINT) AS max_tokens
    FROM t GROUP BY 1
"""
QUERIES["length_buckets"] = q_length_buckets


def q_scd2(spark, sf):
    """Type-2 versioned dimension apply over the customer table: %3 keys get
    a balance bump (a %15 subset gets a LATER second update that must win),
    %7 keys get a no-op update (no spurious version), %11 keys arrive as
    brand-new +1e6 keys. Output is the full post-batch dimension."""
    from batch_processing_pipeline_spark.operators.scd import scd2_apply

    c = _t(spark, sf, "customer").select("c_custkey", "c_name", "c_acctbal")
    t0 = F.to_timestamp(F.lit("1970-01-01 00:00:00"))
    dim = c.select(
        F.col("c_custkey").alias("k"),
        "c_name",
        F.col("c_acctbal").cast("double").alias("bal"),
        t0.alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    t2 = F.to_timestamp(F.lit("2024-01-02 00:00:00"))
    t3 = F.to_timestamp(F.lit("2024-01-03 00:00:00"))
    upd = (
        c.where(F.col("c_custkey") % 3 == 0)
        .select(
            F.col("c_custkey").alias("k"),
            "c_name",
            (F.col("c_acctbal").cast("double") + F.lit(100.0)).alias("bal"),
            t2.alias("ts"),
        )
        .unionByName(
            c.where(F.col("c_custkey") % 15 == 0).select(
                F.col("c_custkey").alias("k"),
                "c_name",
                (F.col("c_acctbal").cast("double") + F.lit(250.0)).alias("bal"),
                t3.alias("ts"),
            )
        )
        .unionByName(
            # no-op update at a DISTINCT earlier ts: equal-ts updates for
            # one key would make the latest-wins tie nondeterministic
            c.where(F.col("c_custkey") % 7 == 0).select(
                F.col("c_custkey").alias("k"),
                "c_name",
                F.col("c_acctbal").cast("double").alias("bal"),
                F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("ts"),
            )
        )
        .unionByName(
            c.where(F.col("c_custkey") % 11 == 0).select(
                (F.col("c_custkey") + F.lit(1000000)).alias("k"),
                "c_name",
                F.lit(0.0).alias("bal"),
                t2.alias("ts"),
            )
        )
    )
    out = scd2_apply(dim, upd, ["k"], ["c_name", "bal"], ts_col="ts")
    return out.select(
        "k", "c_name", round4(F.col("bal")).alias("bal"),
        "valid_from", "valid_to", "is_current",
    )


ORACLES["scd2"] = f"""
    WITH cur AS (
      SELECT c_custkey AS k, c_name, CAST(c_acctbal AS DOUBLE) AS bal,
             TIMESTAMP '1970-01-01 00:00:00' AS valid_from,
             CAST(NULL AS TIMESTAMP) AS valid_to, TRUE AS is_current
      FROM customer
    ), upd_raw AS (
      SELECT c_custkey AS k, c_name, CAST(c_acctbal AS DOUBLE) + 100.0 AS bal,
             TIMESTAMP '2024-01-02 00:00:00' AS ts
      FROM customer WHERE c_custkey % 3 = 0
      UNION ALL
      SELECT c_custkey, c_name, CAST(c_acctbal AS DOUBLE) + 250.0,
             TIMESTAMP '2024-01-03 00:00:00'
      FROM customer WHERE c_custkey % 15 = 0
      UNION ALL
      SELECT c_custkey, c_name, CAST(c_acctbal AS DOUBLE),
             TIMESTAMP '2024-01-01 00:00:00'
      FROM customer WHERE c_custkey % 7 = 0
      UNION ALL
      SELECT c_custkey + 1000000, c_name, 0.0, TIMESTAMP '2024-01-02 00:00:00'
      FROM customer WHERE c_custkey % 11 = 0
    ), latest AS (
      SELECT k, c_name, bal, ts FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY k ORDER BY ts DESC) AS rn
        FROM upd_raw
      ) WHERE rn = 1
    ), j AS (
      SELECT COALESCE(cur.k, latest.k) AS k,
             cur.c_name AS cn, cur.bal AS cb,
             cur.valid_from AS vf, cur.valid_to AS vt,
             latest.c_name AS un, latest.bal AS ub, latest.ts AS uts,
             cur.k IS NOT NULL AS has_cur, latest.k IS NOT NULL AS has_upd,
             NOT (cur.c_name IS NOT DISTINCT FROM latest.c_name
                  AND cur.bal IS NOT DISTINCT FROM latest.bal) AS changed
      FROM cur FULL OUTER JOIN latest ON cur.k = latest.k
    )
    SELECT k, cn AS c_name, {R("cb")} AS bal, vf AS valid_from,
           vt AS valid_to, TRUE AS is_current
    FROM j WHERE has_cur AND (NOT has_upd OR NOT changed)
    UNION ALL
    SELECT k, cn, {R("cb")}, vf, uts, FALSE
    FROM j WHERE has_cur AND has_upd AND changed
    UNION ALL
    SELECT k, un, {R("ub")}, uts, CAST(NULL AS TIMESTAMP), TRUE
    FROM j WHERE has_upd AND (NOT has_cur OR changed)
"""
QUERIES["scd2"] = q_scd2


def q_pack_sequences(spark, sf):
    """Sequence packing for training batches: shard-local next-fit by
    running token total. Docs mod into 32 independent shards (packing is
    embarrassingly parallel — each executor packs its shard alone, the
    honest distributed form of batch packing); within a shard, docs order
    by (tokens DESC, doc_id) and a running-sum window assigns
    bin = floor((cumsum-1)/budget). One shuffle (the window partition),
    everything else map-side."""
    d = _t(spark, sf, "documents")
    budget = 512
    toks = bpe_ish_token_count(F.col("text"))
    base = d.select(
        "doc_id",
        toks.alias("tokens"),
        (F.col("doc_id") % 32).alias("shard"),
    ).where(F.col("tokens") > 0)
    w = (
        Window.partitionBy("shard")
        .orderBy(F.desc("tokens"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("tokens").over(w)
    return base.select(
        "shard",
        "doc_id",
        F.col("tokens").cast("long").alias("tokens"),
        F.floor((cum - F.lit(1)) / F.lit(budget)).cast("long").alias("bin"),
    )


ORACLES["pack_sequences"] = r"""
    WITH base AS (
      SELECT doc_id, doc_id % 32 AS shard,
             CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]'))
                  AS BIGINT) AS tokens
      FROM documents
    )
    SELECT shard, doc_id, tokens,
           CAST(FLOOR((SUM(tokens) OVER (PARTITION BY shard
                                         ORDER BY tokens DESC, doc_id ASC
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                                  AND CURRENT ROW) - 1)
                      / 512.0) AS BIGINT) AS bin
    FROM base WHERE tokens > 0
"""
QUERIES["pack_sequences"] = q_pack_sequences


def q_json_funcs(spark, sf):
    """JSON function surface: path extraction (string + array index) and
    typed parse via from_json. The JSON document is built with concat on
    BOTH sides (not to_json — engines differ on float/key serialization),
    so the oracle isolates the EXTRACTION semantics."""
    o = _t(spark, sf, "orders")
    js = F.concat(
        F.lit('{"status": "'),
        F.col("o_orderstatus"),
        F.lit('", "pri": "'),
        F.col("o_orderpriority"),
        F.lit('", "total": '),
        F.floor(F.col("o_totalprice")).cast("long").cast("string"),
        F.lit(', "items": [1, '),
        (F.col("o_orderkey") % 5).cast("string"),
        F.lit("]}"),
    )
    return o.select(
        "o_orderkey",
        F.get_json_object(js, "$.status").alias("status"),
        F.get_json_object(js, "$.total").alias("total_s"),
        F.get_json_object(js, "$.items[1]").alias("second_item"),
        F.from_json(js, "total long").getField("total").alias("total_n"),
    )


ORACLES["json_funcs"] = """
    WITH j AS (
      SELECT o_orderkey,
             '{"status": "' || o_orderstatus || '", "pri": "' || o_orderpriority
             || '", "total": ' || CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR)
             || ', "items": [1, ' || CAST(o_orderkey % 5 AS VARCHAR) || ']}' AS js
      FROM orders
    )
    SELECT o_orderkey,
           json_extract_string(js, '$.status') AS status,
           json_extract_string(js, '$.total') AS total_s,
           json_extract_string(js, '$.items[1]') AS second_item,
           CAST(json_extract(js, '$.total') AS BIGINT) AS total_n
    FROM j
"""
QUERIES["json_funcs"] = q_json_funcs


def q_dedup_rate(spark, sf):
    """Corpus-level exact-duplicate rate in ONE aggregation pass — the
    summary number a curation run reports before deciding dedup strategy.
    Only md5 digests reach the aggregate, never document text."""
    d = _t(spark, sf, "documents")
    fp = F.md5(F.lower(F.trim(F.col("text"))))
    return d.select(fp.alias("fp")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct(F.col("fp")).alias("n_unique"),
        round4(
            F.lit(1.0)
            - F.count_distinct(F.col("fp")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("dup_rate"),
    )


ORACLES["dedup_rate"] = f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT md5(lower(trim(text)))) AS BIGINT) AS n_unique,
           {R("1.0 - CAST(COUNT(DISTINCT md5(lower(trim(text)))) AS DOUBLE)"
              " / CAST(COUNT(*) AS DOUBLE)")} AS dup_rate
    FROM documents
"""
QUERIES["dedup_rate"] = q_dedup_rate


def q_funnel(spark, sf):
    """Ordered funnel (view → click → purchase): per user, the first view,
    the first click AFTER that view, the first purchase AFTER that click,
    and the stage reached. Each stage is one type-filtered aggregation
    (filter pushes to the scan) joined on the user key — at scale the three
    stage relations are tiny next to the event log, which is read, never
    shuffled raw."""
    e = _events(spark, sf)
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("tv"))
    )
    c = (
        e.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("tv"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tc"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("tc"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tp"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "tv",
            "tc",
            "tp",
            F.when(F.col("tp").isNotNull(), 3)
            .when(F.col("tc").isNotNull(), 2)
            .otherwise(1)
            .cast("int")
            .alias("stage"),
        )
    )


ORACLES["funnel"] = """
    WITH v AS (
      SELECT user_id, MIN(ts) AS tv FROM events
      WHERE event_type = 'view' GROUP BY 1
    ), c AS (
      SELECT e.user_id, MIN(e.ts) AS tc
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.tv GROUP BY 1
    ), p AS (
      SELECT e.user_id, MIN(e.ts) AS tp
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.tc GROUP BY 1
    )
    SELECT v.user_id, v.tv, c.tc, p.tp,
           CAST(CASE WHEN p.tp IS NOT NULL THEN 3
                     WHEN c.tc IS NOT NULL THEN 2 ELSE 1 END AS INTEGER) AS stage
    FROM v LEFT JOIN c ON v.user_id = c.user_id
    LEFT JOIN p ON v.user_id = p.user_id
"""
QUERIES["funnel"] = q_funnel


def q_retention(spark, sf):
    """Cohort retention matrix: users grouped by first-activity day, counted
    on each later active day as (cohort, day_offset, n_users). Two
    aggregations + one join on the user key; the classic growth-analytics
    shape."""
    e = _events(spark, sf)
    first = e.groupBy("user_id").agg(
        F.to_date(F.date_trunc("day", F.min("ts"))).alias("cohort")
    )
    act = e.select("user_id", F.to_date(F.col("ts")).alias("d")).distinct()
    return (
        first.join(act, "user_id")
        .groupBy("cohort", F.datediff(F.col("d"), F.col("cohort")).cast("long").alias("day_offset"))
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


ORACLES["retention"] = """
    WITH first AS (
      SELECT user_id, CAST(date_trunc('day', MIN(ts)) AS DATE) AS cohort
      FROM events GROUP BY 1
    ), act AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    )
    SELECT f.cohort,
           CAST(date_diff('day', f.cohort, a.d) AS BIGINT) AS day_offset,
           COUNT(DISTINCT a.user_id) AS n_users
    FROM first f JOIN act a ON f.user_id = a.user_id
    GROUP BY 1, 2
"""
QUERIES["retention"] = q_retention


def q_bigram_lm(spark, sf):
    """Bigram language-model table: top-3 continuations per word with
    conditional probability P(next | word) — the statistical core of a
    next-word suggester. One explode + count, a per-word window total, and
    a WindowGroupLimit top-k; heads with < 5 observations are dropped.
    Ties on count rank by ``md5(w2)`` — collation-proof across engines."""
    d = _t(spark, sf, "documents")
    s = F.lower(F.trim(F.col("text")))
    toks = F.split(s, r"\s+")
    pairs = (
        d.select(toks.alias("t"))
        .where(F.size("t") >= 2)
        .select(
            F.explode(F.sequence(F.lit(1), F.size("t") - F.lit(1))).alias("i"), "t"
        )
        .select(
            F.element_at("t", F.col("i")).alias("w1"),
            F.element_at("t", F.col("i") + F.lit(1)).alias("w2"),
        )
    )
    c = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n"))
    wtot = Window.partitionBy("w1")
    wrank = Window.partitionBy("w1").orderBy(
        F.desc("n"), F.md5(F.encode(F.col("w2"), "UTF-8")).asc()
    )
    return (
        c.withColumn("tot", F.sum("n").over(wtot))
        .withColumn("rk", F.row_number().over(wrank))
        .where((F.col("rk") <= 3) & (F.col("tot") >= 5))
        .select(
            "w1",
            "rk",
            "w2",
            "n",
            round4(F.col("n").cast("double") / F.col("tot").cast("double")).alias(
                "prob"
            ),
        )
    )


ORACLES["bigram_lm"] = rf"""
    WITH d AS (SELECT lower(trim(text)) AS s FROM documents
               WHERE length(trim(text)) > 0),
         tk AS (SELECT string_split_regex(s, '\s+') AS t FROM d),
         p AS (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
               FROM tk WHERE len(t) >= 2),
         g AS (SELECT t[i] AS w1, t[i + 1] AS w2 FROM p),
         c AS (SELECT w1, w2, COUNT(*) AS n FROM g GROUP BY 1, 2),
         w AS (SELECT w1, w2, n,
                      SUM(n) OVER (PARTITION BY w1) AS tot,
                      ROW_NUMBER() OVER (PARTITION BY w1
                                         ORDER BY n DESC, md5(w2) ASC) AS rk
               FROM c)
    SELECT w1, CAST(rk AS INTEGER) AS rk, w2, n,
           {R("CAST(n AS DOUBLE) / CAST(tot AS DOUBLE)")} AS prob
    FROM w WHERE rk <= 3 AND tot >= 5
"""
QUERIES["bigram_lm"] = q_bigram_lm


def q_outliers(spark, sf):
    """Group-wise z-score outlier flagging: events whose value sits more
    than 2 sample standard deviations from their type's mean. The filter
    applies to the ROUNDED z (engine-portable float contract)."""
    e = _events(spark, sf)
    w = Window.partitionBy("event_type")
    z = (F.col("value") - F.avg("value").over(w)) / F.stddev_samp("value").over(w)
    return (
        e.select("event_id", "event_type", round4(F.col("value")).alias("value"),
                 round4(z).alias("z"))
        .where(F.abs(F.col("z")) > 2.0)
    )


ORACLES["outliers"] = f"""
    WITH z AS (
      SELECT event_id, event_type, value,
             {R("(value - AVG(value) OVER (PARTITION BY event_type))"
                " / STDDEV_SAMP(value) OVER (PARTITION BY event_type)")} AS z
      FROM events
    )
    SELECT event_id, event_type, {R("value")} AS value, z
    FROM z WHERE ABS(z) > 2.0
"""
QUERIES["outliers"] = q_outliers


def q_sample_weighted(spark, sf):
    """Deterministic WEIGHTED sampling: keep probability proportional to a
    per-row weight (here min(n_chars/1000, 1)). The uniform draw is the
    md5-hex trick of operators/sampling.py; the per-row threshold is the
    weight scaled to 32 bits and hex-formatted — identical arithmetic in
    both engines, zero shuffles, reproducible under retries."""
    d = _t(spark, sf, "documents")
    n = F.length(F.col("text")).cast("double")
    p = F.least(n / F.lit(1000.0), F.lit(1.0))
    thr_n = F.least(
        F.floor(p * F.lit(4294967296.0)), F.lit(4294967295.0)
    ).cast("bigint")
    thr_hex = F.format_string("%08x", thr_n)
    u = F.substring(F.md5(F.concat(F.lit("wsamp:"), F.col("doc_id").cast("string"))), 1, 8)
    return d.where(u < thr_hex).select(
        "doc_id", F.length(F.col("text")).cast("long").alias("n_chars_w")
    )


ORACLES["sample_weighted"] = """
    SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_w
    FROM documents
    WHERE substr(md5('wsamp:' || CAST(doc_id AS VARCHAR)), 1, 8)
          < printf('%08x', CAST(LEAST(FLOOR(
                LEAST(CAST(length(text) AS DOUBLE) / 1000.0, 1.0) * 4294967296.0
            ), 4294967295.0) AS BIGINT))
"""
QUERIES["sample_weighted"] = q_sample_weighted


def q_interval_join(spark, sf):
    """Point-in-interval join via the bucketed equi-key scale path
    (operators/interval.py): high-value purchase events open a 1-hour
    window; count every event falling inside each window. The naive
    range-predicate formulation would plan as a nested-loop/cartesian
    join; the bucketed form shuffles both sides on floor(ts/w) and
    equi-joins (w = 3600 s, so each interval covers ≤ 2 buckets)."""
    from batch_processing_pipeline_spark.operators.interval import (
        bucketed_interval_join,
    )

    e = _events(spark, sf)
    pts = e.select(
        F.unix_timestamp("ts").alias("pt"), F.col("value").alias("pt_value")
    )
    wins = e.where(
        (F.col("event_type") == "purchase") & (F.col("event_id") % 23 == 0)
    ).select(
        F.col("event_id").alias("win_id"),
        F.unix_timestamp("ts").alias("win_s"),
        (F.unix_timestamp("ts") + F.lit(3600)).alias("win_e"),
    )
    j = bucketed_interval_join(pts, wins, "pt", "win_s", "win_e", bucket_seconds=3600)
    return j.groupBy("win_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        round4(F.sum("pt_value")).alias("sum_value"),
    )


ORACLES["interval_join"] = f"""
    WITH w AS (
      SELECT event_id AS win_id, CAST(floor(epoch(ts)) AS BIGINT) AS s,
             CAST(floor(epoch(ts)) AS BIGINT) + 3600 AS e
      FROM events WHERE event_type = 'purchase' AND event_id % 23 = 0
    )
    SELECT w.win_id, CAST(COUNT(*) AS BIGINT) AS n_events,
           {R("SUM(ev.value)")} AS sum_value
    FROM w JOIN events ev
      ON CAST(floor(epoch(ev.ts)) AS BIGINT) >= w.s
     AND CAST(floor(epoch(ev.ts)) AS BIGINT) < w.e
    GROUP BY 1
"""
QUERIES["interval_join"] = q_interval_join


def q_fuzzy_join(spark, sf):
    """Edit-distance-1 self-match over the distinct part-name dictionary via
    deletion-neighborhood blocking (operators/fuzzy.py) — candidates come
    from an equi-join on single-deletion variants (recall-lossless for
    d <= 1), never a cartesian; exact levenshtein verifies survivors."""
    from batch_processing_pipeline_spark.operators.fuzzy import fuzzy_self_join

    names = (
        _t(spark, sf, "part")
        .select(F.col("p_name"))
        .distinct()
        .select(F.col("p_name").alias("nid"), F.col("p_name").alias("s"))
    )
    r = fuzzy_self_join(names, "nid", "s", max_distance=1)
    return r.select(
        F.col("id_a").alias("name_a"), F.col("id_b").alias("name_b"), "distance"
    )


ORACLES["fuzzy_join"] = """
    WITH names AS (SELECT DISTINCT p_name FROM part)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS distance
    FROM names a JOIN names b ON a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 1
"""
QUERIES["fuzzy_join"] = q_fuzzy_join


def q_time_rollup(spark, sf):
    """Hypertable-style multi-grain time rollup: hour + day + grand total
    in ONE pass via ROLLUP (partial aggregation happens map-side for every
    grain before the single shuffle — vs. three separate scans). Grains are
    projected as strings so the grouping keys hash identically across
    engines (Spark date_trunc returns TIMESTAMP, DuckDB DATE — strings
    sidestep the type mismatch)."""
    e = _events(spark, sf)
    day = F.date_format("ts", "yyyy-MM-dd")
    hour = F.date_format("ts", "yyyy-MM-dd HH:00")
    return (
        e.select(day.alias("day"), hour.alias("hour"), "value")
        .rollup("day", "hour")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            round4(sum_money(F.col("value"))).alias("sum_value"),
        )
    )


ORACLES["time_rollup"] = f"""
    SELECT strftime(ts, '%Y-%m-%d') AS day,
           strftime(ts, '%Y-%m-%d %H:00') AS hour,
           CAST(COUNT(*) AS BIGINT) AS n,
           {R(sql_sum_money('value'))} AS sum_value
    FROM events
    GROUP BY ROLLUP(day, hour)
"""
QUERIES["time_rollup"] = q_time_rollup


def q_doc_chunk(spark, sf):
    """Overlapping fixed-width chunking (size 500, stride 400) of every
    document — zero-shuffle map-side explode (operators/chunking.py)."""
    from batch_processing_pipeline_spark.operators.chunking import chunk_documents

    d = _t(spark, sf, "documents")
    return chunk_documents(d, "doc_id", "text", size=500, stride=400)


ORACLES["doc_chunk"] = """
    WITH c AS (
      SELECT doc_id, text,
             unnest(range(0, 1 + (length(text) - 1) // 400)) AS chunk_idx
      FROM documents WHERE text IS NOT NULL AND length(text) >= 1
    )
    SELECT doc_id, chunk_idx,
           chunk_idx * 400 + 1 AS chunk_start,
           CAST(length(substr(text, CAST(chunk_idx * 400 + 1 AS INTEGER), 500))
                AS BIGINT) AS chunk_len,
           md5(substr(text, CAST(chunk_idx * 400 + 1 AS INTEGER), 500)) AS chunk_md5
    FROM c
"""
QUERIES["doc_chunk"] = q_doc_chunk


def q_skew_join(spark, sf):
    """Salted replicated join (operators/skew.py salted_join): lineitem
    fact salted on row content, orders dim replicated 16×, joined on
    (key, salt) — the explicit skew-safe join form whose result equals the
    plain equi-join (which is exactly what the oracle computes)."""
    from batch_processing_pipeline_spark.operators.skew import salted_join

    li = _t(spark, sf, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity")
    o = _t(spark, sf, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    j = salted_join(li, o, on="l_orderkey", salt_key=["l_orderkey", "l_linenumber"])
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        round4(F.sum("l_quantity")).alias("sum_qty"),
    )


ORACLES["skew_join"] = f"""
    SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
           {R("SUM(l.l_quantity)")} AS sum_qty
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1
"""
QUERIES["skew_join"] = q_skew_join


def q_char_entropy(spark, sf):
    """Shannon entropy of the per-document character distribution — the
    classic gibberish/boilerplate quality signal (low entropy = repeated
    filler, high = random noise). Codegen position-explode → (doc, char)
    counts with map-side combine → window-normalized probabilities → one
    aggregate; no Python, two shuffles, both on (doc_id[, ch])."""
    d = _t(spark, sf, "documents")
    t = F.lower(F.col("text"))
    chars = (
        d.where(F.length(t) >= 1)
        .select(
            "doc_id",
            t.alias("_t"),
            F.explode(F.sequence(F.lit(1), F.length(t))).alias("_i"),
        )
        .select("doc_id", F.col("_t").substr(F.col("_i"), F.lit(1)).alias("ch"))
    )
    counts = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("doc_id")
    probs = counts.select(
        "doc_id",
        (F.col("c").cast("double") / F.sum("c").over(w)).alias("p"),
    )
    return probs.groupBy("doc_id").agg(
        round4(-F.sum(F.col("p") * F.log2("p"))).alias("entropy")
    )


ORACLES["char_entropy"] = f"""
    WITH chars AS (
      SELECT doc_id,
             unnest(list_transform(range(1, length(lower(text)) + 1),
                    i -> substr(lower(text), CAST(i AS INTEGER), 1))) AS ch
      FROM documents WHERE length(text) >= 1
    ), counts AS (
      SELECT doc_id, ch, COUNT(*) AS c FROM chars GROUP BY 1, 2
    ), probs AS (
      SELECT doc_id,
             CAST(c AS DOUBLE) / CAST(SUM(c) OVER (PARTITION BY doc_id) AS DOUBLE) AS p
      FROM counts
    )
    SELECT doc_id, {R("-SUM(p * log2(p))")} AS entropy
    FROM probs GROUP BY 1
"""
QUERIES["char_entropy"] = q_char_entropy


def q_cusum(spark, sf):
    """CUSUM drift tracking: per event type, the running sum of deviations
    from the type mean in (ts, event_id) order — the standard changepoint
    statistic (a sustained shift in the metric shows as a trend in the
    cusum).

    Arithmetic is EXACT until the final projection (round-11 fix): the
    naive ``Σ(value - avg(value))`` form accumulates the engines' float
    disagreement in the mean — avg over an UNORDERED partition is
    summation-order-dependent, and the running sum multiplies that ε by
    the row index, so at 10× rows (the sf1 fixture) i·ε crossed the
    round4 boundary and the cross-engine hash diverged. Rewritten as
    ``cusum_i = (prefix_i·N − i·S) / N`` with prefix/S as DECIMAL(30,10)
    sums (exact, order-independent in both engines) and one double
    division of identical operands at the end — bit-identical across
    engines at ANY scale."""
    e = _events(spark, sf)
    vdec = F.col("value").cast("decimal(30,10)")
    w_t = Window.partitionBy("event_type")
    w_run = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prefix = F.sum(vdec).over(w_run)
    total = F.sum(vdec).over(w_t)
    i = F.count(F.lit(1)).over(w_run)
    n = F.count(F.lit(1)).over(w_t)
    numer = (prefix * n - total * i).cast("double")
    return e.select(
        "event_id",
        "event_type",
        round4(numer / n.cast("double")).alias("cusum"),
    )


ORACLES["cusum"] = f"""
    SELECT event_id, event_type,
           {R("CAST(prefix * n - total * i AS DOUBLE) / CAST(n AS DOUBLE)")}
               AS cusum
    FROM (
      SELECT event_id, event_type,
             SUM(CAST(value AS DECIMAL(30,10))) OVER (
               PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prefix,
             SUM(CAST(value AS DECIMAL(30,10)))
                 OVER (PARTITION BY event_type) AS total,
             COUNT(*) OVER (
               PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS i,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    )
"""
QUERIES["cusum"] = q_cusum


def q_mm_frames(spark, sf):
    """REAL video-style frame sampling: synthesize an animated GIF per
    document (stdlib encoder; dims/frame count/fill derived from text
    length), LZW-decode it inside mapInPandas, sample 4 evenly spaced
    frames, and emit per-frame stats. The oracle recomputes frame length
    and pixel sum arithmetically — any LZW/composition/sampling bug breaks
    the match."""
    from batch_processing_pipeline_spark.multimodal.binary_ops import (
        frame_stats,
        sample_frames,
        synthesize_gif,
    )

    d = _t(spark, sf, "documents").select("doc_id", "text")
    return frame_stats(sample_frames(synthesize_gif(d), n_frames=4, fake=False))


ORACLES["mm_frames"] = """
    WITH base AS (
      SELECT doc_id, length(text) AS L FROM documents
    ), f AS (
      SELECT doc_id, L, unnest(range(0, 4)) AS frame_idx FROM base
    )
    SELECT doc_id,
           CAST(frame_idx AS INTEGER) AS frame_idx,
           CAST((L % 11 + 1) * (L % 5 + 1) AS BIGINT) AS frame_len,
           CAST((L % 11 + 1) * (L % 5 + 1)
                * ((L + 7 * ((frame_idx * (L % 3 + 2)) // 4)) % 251)
                AS BIGINT) AS pixel_sum
    FROM f
"""
QUERIES["mm_frames"] = q_mm_frames


def q_mm_video_avi(spark, sf):
    """REAL video-CONTAINER frame sampling: synthesize an uncompressed-DIB
    AVI per document (stdlib RIFF encoder; dims/frame count/fill derived
    from text length), walk the container and decode frames inside
    mapInPandas, sample 3 evenly spaced frames, and emit per-frame stats.
    The AVI twin of ``mm_frames``'s GIF path — any RIFF-walk/DIB-decode/
    sampling bug breaks the oracle match."""
    from batch_processing_pipeline_spark.multimodal.binary_ops import (
        frame_stats,
        sample_frames,
        synthesize_avi,
    )

    d = _t(spark, sf, "documents").select("doc_id", "text")
    return frame_stats(sample_frames(synthesize_avi(d), n_frames=3, fake=False))


ORACLES["mm_video_avi"] = """
    WITH base AS (
      SELECT doc_id, length(text) AS L FROM documents
    ), f AS (
      SELECT doc_id, L, unnest(range(0, 3)) AS frame_idx FROM base
    )
    SELECT doc_id,
           CAST(frame_idx AS INTEGER) AS frame_idx,
           CAST((L % 6 + 1) * (L % 4 + 1) * 3 AS BIGINT) AS frame_len,
           CAST((L % 6 + 1) * (L % 4 + 1) * 3
                * ((L * 7 + 13 * ((frame_idx * (L % 3 + 2)) // 3)) % 251)
                AS BIGINT) AS pixel_sum
    FROM f
"""
QUERIES["mm_video_avi"] = q_mm_video_avi


def q_wow_growth(spark, sf):
    """Week-over-week growth per event type. Weeks are absolute epoch
    buckets (floor(epoch/604800)) — calendar-week functions disagree
    across engines (ISO vs US weeks), epoch arithmetic cannot. The first
    week per type has NULL growth (nothing to compare against)."""
    e = _events(spark, sf)
    week = F.floor(F.unix_timestamp("ts") / F.lit(604800))
    weekly = (
        e.select(week.alias("week_bucket"), "event_type")
        .groupBy("event_type", "week_bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    w = Window.partitionBy("event_type").orderBy("week_bucket")
    prev = F.lag("n").over(w)
    return weekly.select(
        "event_type",
        "week_bucket",
        "n",
        round4(
            (F.col("n") - prev).cast("double") / prev.cast("double")
        ).alias("wow_growth"),
    )


ORACLES["wow_growth"] = f"""
    WITH weekly AS (
      SELECT event_type,
             CAST(floor(floor(epoch(ts)) / 604800) AS BIGINT) AS week_bucket,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, week_bucket, n,
           {R("CAST(n - LAG(n) OVER (PARTITION BY event_type ORDER BY week_bucket) AS DOUBLE)"
              " / CAST(LAG(n) OVER (PARTITION BY event_type ORDER BY week_bucket) AS DOUBLE)")}
               AS wow_growth
    FROM weekly
"""
QUERIES["wow_growth"] = q_wow_growth


def q_equidepth_buckets(spark, sf):
    """Equi-depth (decile) histogram of lineitem quantity — the scale-safe
    formulation: exact decile boundaries from ONE tiny aggregate row,
    broadcast back, bucket assigned map-side as a sum of comparisons.
    (A global ntile() would sort the whole table through one reducer;
    this plans as agg + broadcast + map — no global sort at any size.)"""
    li = _t(spark, sf, "lineitem")
    qs = [i / 10.0 for i in range(1, 10)]
    bounds = li.agg(
        *[
            F.percentile("l_quantity", F.lit(q)).alias(f"_b{i}")
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


ORACLES["equidepth_buckets"] = f"""
    WITH b AS (
      SELECT {", ".join(f"quantile_cont(l_quantity, {i/10.0}) AS _b{i-1}" for i in range(1, 10))}
      FROM lineitem
    )
    SELECT CAST(1 + {" + ".join(f"(CASE WHEN l_quantity > _b{i} THEN 1 ELSE 0 END)" for i in range(9))}
                AS INTEGER) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           {R("MIN(l_quantity)")} AS min_q,
           {R("MAX(l_quantity)")} AS max_q
    FROM lineitem, b
    GROUP BY 1
"""
QUERIES["equidepth_buckets"] = q_equidepth_buckets


def q_dedup_survivorship(spark, sf):
    """Golden-record selection over near-dup clusters: every document in
    the bounded scope gets a cluster (components over jaccard-0.5 pairs;
    singletons are their own cluster), and each cluster elects a survivor
    — longest text, ties to the smallest doc_id. The standard curation
    step after near-dedup: keep one representative per duplicate group."""
    from batch_processing_pipeline_spark.operators.components import (
        connected_components,
    )

    d = _t(spark, sf, "documents").where(F.col("doc_id") < 60)
    pairs = ngram_jaccard_pairs(d, shingle_n=3, threshold=0.5)
    comp = connected_components(pairs).select(
        F.col("node").alias("doc_id"), "component"
    )
    labeled = (
        d.select("doc_id", F.length("text").cast("long").alias("n_chars_s"))
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            "n_chars_s",
            F.coalesce("component", "doc_id").alias("cluster"),
        )
    )
    w = Window.partitionBy("cluster").orderBy(
        F.desc("n_chars_s"), F.asc("doc_id")
    )
    ranked = labeled.withColumn("rn", F.row_number().over(w))
    sizes = labeled.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("long").alias("n_members")
    )
    return (
        ranked.where(F.col("rn") == 1)
        .join(sizes, "cluster")
        .select(
            "cluster",
            F.col("doc_id").alias("survivor_doc_id"),
            F.col("n_chars_s").alias("survivor_chars"),
            "n_members",
        )
    )


ORACLES["dedup_survivorship"] = f"""
    WITH RECURSIVE sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, length(lower(trim(text))) - 1),
                                          i -> substring(lower(trim(text)), i, 3))) AS sh
      FROM documents
      WHERE doc_id < 60 AND length(lower(trim(text))) >= 3
    ), pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE {R(_JACC)} >= 0.5
    ), edges AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION
      SELECT id_b AS u, id_a AS v FROM pairs
    ), reach AS (
      SELECT u AS node, u AS r FROM edges
      UNION
      SELECT e.u AS node, reach.r
      FROM edges e JOIN reach ON e.v = reach.node
    ), comp AS (
      SELECT node AS doc_id, MIN(r) AS component FROM reach GROUP BY node
    ), labeled AS (
      SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS n_chars_s,
             COALESCE(c.component, d.doc_id) AS cluster
      FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
      WHERE d.doc_id < 60
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY cluster
                                   ORDER BY n_chars_s DESC, doc_id ASC) AS rn
      FROM labeled
    )
    SELECT r.cluster, r.doc_id AS survivor_doc_id,
           r.n_chars_s AS survivor_chars, s.n_members
    FROM ranked r
    JOIN (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_members
          FROM labeled GROUP BY 1) s ON r.cluster = s.cluster
    WHERE r.rn = 1
"""
QUERIES["dedup_survivorship"] = q_dedup_survivorship


