"""Registry section: DQ01-DQ29 declared relational surface, LLM-pipeline core queries, and their oracle SQL.

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
    Callable,
    DataFrame,
    F,
    ORACLES,
    QUERIES,
    R,
    STOPWORDS,
    SparkSession,
    Window,
    _events,
    _t,
    attach_media,
    bpe_ish_token_count,
    cosine_topk,
    exact_dedup,
    expand_prefixes,
    language_id,
    media_stats,
    minhash_lsh_dedup,
    ngram_jaccard_pairs,
    normalize_queries,
    pd,
    prefix_frequencies,
    punct_ratio,
    quality_score,
    round4,
    sessionize,
    signlsh_topk,
    simhash_dedup,
    stopword_ratio,
    tokens,
    top_k_per_group,
    whitespace_token_count,
)

# =====================================================================
# DQ01–DQ28: the declared relational surface (SURVEY.md §2.4)
# =====================================================================


def dq01(spark, sf):
    """Scan + projection (reference text scan analog: SURVEY §2.1 #1)."""
    return _t(spark, sf, "region").select("r_regionkey", "r_name")


def dq02(spark, sf):
    """Filter / compound predicate (§2.1 #2) — pushed to the parquet scan."""
    o = _t(spark, sf, "orders")
    return o.where(
        (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 1000.0)
    ).select("o_orderkey", round4(F.col("o_totalprice")).alias("price"))


def dq03(spark, sf):
    """Normalization projection (§2.1 #2-#3: lower(trim()) + length guard)."""
    d = _t(spark, sf, "documents")
    return normalize_queries(
        d.select("doc_id", "text"), text_col="text", out_col="q",
        carry_cols=("doc_id",),
    )


def dq04(spark, sf):
    """Prefix fan-out generator (§2.1 #4), bounded L=2..8 for the oracle."""
    d = _t(spark, sf, "documents")
    norm = d.select("doc_id", F.lower(F.trim(F.col("text"))).alias("query"))
    return expand_prefixes(norm, max_len=8, carry_cols=("doc_id",)).select(
        "doc_id", "prefix"
    )


def dq05(spark, sf):
    """Hash aggregation: sum/avg/count (§2.1 #6/#10)."""
    l = _t(spark, sf, "lineitem")
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        round4(F.sum("l_quantity")).alias("sum_qty"),
        # money/ratio sums in exact integer cents (r12 sweep — order-free,
        # so both engines agree at any group size); quantity sums stay
        # double: integer-valued, exact under any association below 2^53
        round4(sum_money(F.col("l_extendedprice"))).alias("sum_price"),
        round4(
            F.sum(cents(F.col("l_discount")))
            / (F.lit(100.0) * F.count(F.lit(1)))
        ).alias("avg_disc"),
        F.count(F.lit(1)).alias("n"),
    )


def dq06(spark, sf):
    o = _t(spark, sf, "orders")
    return o.groupBy("o_orderstatus").agg(F.countDistinct("o_custkey").alias("n_cust"))


def dq07(spark, sf):
    """Inner equi-join; small side broadcast (customer ≪ orders at scale)."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"), round4(sum_money(F.col("o_totalprice"))).alias("total"))
    )


def dq08(spark, sf):
    """Star join region→nation→customer→orders; dims broadcast."""
    r = F.broadcast(_t(spark, sf, "region"))
    n = F.broadcast(_t(spark, sf, "nation"))
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.count("o_orderkey").alias("orders_n"))
    )


def dq09(spark, sf):
    """Left outer join + null handling: customers with zero orders."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .where(F.col("n_orders") == 0)
    )


def dq10(spark, sf):
    """Left-semi join (EXISTS)."""
    s = _t(spark, sf, "supplier")
    l = _t(spark, sf, "lineitem").where(F.col("l_quantity") > 45)
    return s.join(l, s.s_suppkey == l.l_suppkey, "left_semi").select(
        "s_suppkey", "s_name"
    )


def dq11(spark, sf):
    """Left-anti join (NOT EXISTS)."""
    p = _t(spark, sf, "part")
    l = _t(spark, sf, "lineitem")
    return p.join(l, p.p_partkey == l.l_partkey, "left_anti").select("p_partkey")


def dq12(spark, sf):
    """Theta/range join (non-equi conjunct on top of the equi key)."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    return (
        c.join(o, (o.o_custkey == c.c_custkey) & (o.o_totalprice > c.c_acctbal))
        .groupBy("c_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def dq13(spark, sf):
    """Top-K per group with deterministic tie-break (engine topk operator)."""
    o = _t(spark, sf, "orders")
    return top_k_per_group(
        o,
        group_cols=["o_custkey"],
        order_by=[F.desc("o_totalprice"), F.asc("o_orderkey")],
        k=3,
    ).select("o_custkey", "rk", "o_orderkey", round4(F.col("o_totalprice")).alias("price"))


def dq14(spark, sf):
    """Analytic window: lag + running frame."""
    e = _events(spark, sf)
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return e.select(
        "user_id",
        "event_id",
        round4(F.col("value")).alias("v"),
        round4(
            F.sum(cents(F.col("value"))).over(run) / F.lit(100.0)
        ).alias("running"),
        round4(F.coalesce(F.lag("value").over(w), F.lit(0.0))).alias("prev_v"),
    )


def dq15(spark, sf):
    """Global sort + limit (top-k over everything)."""
    o = _t(spark, sf, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", round4(F.col("o_totalprice")).alias("price"))
    )


def dq16(spark, sf):
    """Set operations: INTERSECT + EXCEPT (distinct semantics), tagged union."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    i = (
        c.where(F.col("c_acctbal") > 0)
        .select("c_custkey")
        .intersect(
            o.where(F.col("o_orderstatus") == "O").select(
                F.col("o_custkey").alias("c_custkey")
            )
        )
        .select(F.lit("i").alias("tag"), "c_custkey")
    )
    e = (
        c.select("c_custkey")
        .subtract(o.select(F.col("o_custkey").alias("c_custkey")))
        .select(F.lit("e").alias("tag"), "c_custkey")
    )
    return i.unionByName(e)


def dq17(spark, sf):
    """ROLLUP + GROUPING()."""
    o = _t(spark, sf, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g1"),
            F.grouping("o_orderpriority").cast("int").alias("g2"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("prio"),
            "g1",
            "g2",
            "n",
        )
    )


def dq18(spark, sf):
    """CUBE + GROUPING()."""
    l = _t(spark, sf, "lineitem")
    return (
        l.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g1"),
            F.grouping("l_linestatus").cast("int").alias("g2"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
            "g1",
            "g2",
            "n",
        )
    )


def dq19(spark, sf):
    """String function surface."""
    p = _t(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("b_up"),
        F.substring("p_name", 1, 5).alias("name5"),
        F.length("p_name").cast("long").alias("name_len"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_u"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size4"),
        F.reverse("p_brand").alias("b_rev"),
    )


def dq20(spark, sf):
    """Date/time surface (UTC session — H9).

    The money total sums EXACT INTEGER CENTS (the rfm_scores sf1
    lesson, re-taught by this row at sf10): a double SUM over ~190k
    values/group diverges from DuckDB's summation order by up to ~8e-4,
    which round4 then amplifies across the 4th decimal — and at this
    row's total magnitudes (~1e4-1e10 across partial/full months) the
    canonicalizer's 10-significant-digit format does NOT absorb the
    flip. o_totalprice is 2-decimal money, so cents are exact longs and
    both engines agree bit-for-bit at every scale. Round 12: uses the
    repo-wide ``sum_money`` helper (functions/rounding.py — sign-safe
    ROUND, not the positive-only floor(x·100+0.5) this row debuted)."""
    o = _t(spark, sf, "orders")
    return o.groupBy(
        F.year("o_orderdate").alias("y"), F.month("o_orderdate").alias("m")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        sum_money(F.col("o_totalprice")).alias("total"),
    )


def dq21(spark, sf):
    """Math surface."""
    l = _t(spark, sf, "lineitem").where(F.col("l_orderkey") <= 100)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        round4(
            F.col("l_extendedprice")
            * (F.lit(1) - F.col("l_discount"))
            * (F.lit(1) + F.col("l_tax"))
        ).alias("charge"),
        F.floor("l_quantity").alias("fq"),
        F.ceil("l_quantity").alias("cq"),
        (F.col("l_orderkey") % 7).alias("m7"),
        round4(F.sqrt("l_extendedprice")).alias("sq"),
    )


def dq22(spark, sf):
    """Conditional surface: CASE WHEN / NULLIF."""
    o = _t(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 2000, "high")
        .when(F.col("o_totalprice") >= 500, "mid")
        .otherwise("low")
        .alias("bucket"),
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("st_or_null"),
    )


def dq23(spark, sf):
    """Tumbling time bucket (batch twin of the streaming window)."""
    e = _events(spark, sf)
    return e.groupBy(
        F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("h_epoch"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        round4(sum_money(F.col("value"))).alias("sv"),
    )


def dq24(spark, sf):
    """Gap-based sessionization (engine sessionize operator; twin of
    F.session_window)."""
    e = _events(spark, sf)
    s = sessionize(e, gap_seconds=1800)
    return s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("events_in_session")
    )


def dq25(spark, sf):
    """JSON extraction."""
    e = _events(spark, sf)
    return e.select("event_id", F.get_json_object("props", "$.k").alias("k"))


def dq26(spark, sf):
    """Array ops / dot-product similarity via ordered double fold."""
    from batch_processing_pipeline_spark.functions.vector import dot_product

    emb = _t(spark, sf, "embeddings")
    a = emb.where(F.col("vec_id") == 0).select(F.col("embedding").alias("va"))
    b = emb.where(F.col("vec_id").between(1, 10)).select(
        F.col("vec_id").alias("qb"), F.col("embedding").alias("vb")
    )
    return (
        F.broadcast(a)
        .crossJoin(b)
        .select("qb", round4(dot_product(F.col("va"), F.col("vb"))).alias("dot"))
    )


def dq27(spark, sf):
    """Exact dedup accounting per language."""
    d = _t(spark, sf, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("total"),
        F.countDistinct(F.lower(F.trim(F.col("text")))).alias("uniq"),
    )


def dq28(spark, sf):
    """The reference pipeline end-to-end, distilled (bounded L=2..8, K=3):
    normalize → prefix fan-out → frequency → deterministic top-K."""
    d = _t(spark, sf, "documents")
    queries = normalize_queries(d, text_col="text")
    freq = prefix_frequencies(queries, max_len=8)
    return top_k_per_group(
        freq,
        group_cols=["prefix"],
        order_by=[F.desc("frequency"), F.asc("query")],
        k=3,
    ).select("prefix", "rk", "query", "frequency")


# =====================================================================
# LLM-data-pipeline extensions
# =====================================================================


def q_wordcount(spark, sf):
    """Classic WordCount (reference §2.2: deleted me.spark.WordCount job)."""
    d = _t(spark, sf, "documents")
    return (
        d.select(F.explode(tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_dedup_exact(spark, sf):
    """Exact dedup via md5 fingerprint — deterministic survivor + group size."""
    return exact_dedup(_t(spark, sf, "documents"))


def q_dedup_jaccard(spark, sf):
    """Exact all-pairs 3-gram Jaccard ≥ 0.5 over a bounded scope (ground
    truth for the LSH path)."""
    d = _t(spark, sf, "documents").where(F.col("doc_id") < 60)
    return ngram_jaccard_pairs(d, shingle_n=3, threshold=0.5)


def q_dedup_minhash(spark, sf):
    """MinHash+LSH near-dup pairs (approximate scale path; rows-only check —
    validated against exact Jaccard in tests/test_dedup.py).

    The fixture corpus has no true near-dups (pairwise 5-gram Jaccard tops
    out ≈0.31), so the query plants one: each document unioned with a
    lightly mutated copy (id + 10^7, one appended token). The operator must
    recover exactly those planted pairs at threshold 0.8.
    """
    d = _t(spark, sf, "documents").select("doc_id", "text")
    mutated = d.select(
        (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" mutated")).alias("text"),
    )
    corpus = d.unionByName(mutated)
    # sample_mod stays at the operator default (2): quarter-density
    # sampling (4) was measured ~25% faster here but loses ~0.4% of the
    # true ≥0.8 pairs at the band stage on this corpus — recall is the
    # product, so the speed comes from AQE partition coalescing
    # (session.py parallelismFirst=false) instead.
    return minhash_lsh_dedup(corpus, shingle_n=5, num_perm=32, bands=8, threshold=0.8)


def q_dedup_simhash(spark, sf):
    """SimHash near-dup pairs (hash-dependent; rows-only check)."""
    d = _t(spark, sf, "documents").select(
        "doc_id", tokens(F.col("text")).alias("tokens")
    )
    return simhash_dedup(d, max_hamming=8, bands=4)


def q_sim_topk(spark, sf):
    """Brute-force exact cosine top-10 for query vectors 0..4."""
    emb = _t(spark, sf, "embeddings")
    return cosine_topk(emb.where(F.col("vec_id") < 5), emb, k=10)


def q_sim_topk_lsh(spark, sf):
    """Sign-LSH approximate cosine top-10 (scale path; rows-only check —
    recall vs brute force asserted in tests/test_similarity.py). Runs with
    Hamming-1 multi-probe on the broadcast query side — the production
    default since round 7: recall 0.69 -> 0.99 on the fixture for at most
    (n_planes+1)x candidate growth before dedup."""
    emb = _t(spark, sf, "embeddings")
    return signlsh_topk(
        emb.where(F.col("vec_id") < 5), emb, dim=64, k=10, n_planes=6,
        n_tables=8, multiprobe=1,
    )


def q_text_stats(spark, sf):
    """Token counting + quality scoring surface."""
    d = _t(spark, sf, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        F.length(t).cast("long").alias("n_chars_m"),
        whitespace_token_count(t).alias("ws_tokens"),
        bpe_ish_token_count(t).alias("bpe_tokens"),
        round4(punct_ratio(t)).alias("punct_r"),
        round4(stopword_ratio(t, "en")).alias("stop_r"),
        round4(quality_score(t)).alias("quality"),
    )


def q_text_langid(spark, sf):
    """Stopword-overlap language ID."""
    d = _t(spark, sf, "documents")
    return d.select("doc_id", language_id(F.col("text")).alias("lang_pred"))


def q_text_fingerprint(spark, sf):
    """Document fingerprints: md5 of normalized text + min-md5 shingle hash
    (codegen'd bulk formulation — same values as the column form)."""
    from batch_processing_pipeline_spark.functions.text_analysis import (
        shingle_fingerprints,
    )

    d = _t(spark, sf, "documents")
    return shingle_fingerprints(d, "doc_id", "text", 5)


def q_mm_stats(spark, sf):
    """Multimodal binary columns: byte length + sha256 over opaque payloads."""
    d = attach_media(_t(spark, sf, "documents"))
    return media_stats(d)


def q_mm_decode(spark, sf):
    """REAL image decode round trip: synthesize a grayscale PNG per document
    (stdlib encoder, dims derived from text length), then decode it with the
    stdlib PNG decoder inside mapInPandas. The oracle recomputes the
    dimensions arithmetically — any header/filter/zlib bug breaks the match."""
    from batch_processing_pipeline_spark.multimodal.binary_ops import (
        decode_image_batches,
        synthesize_png,
    )

    d = _t(spark, sf, "documents").select("doc_id", "text")
    return decode_image_batches(synthesize_png(d), fake=False)


def dq29_grouping_sets(spark, sf):
    """GROUPING SETS through the SQL entry point (spark.sql passthrough)."""
    _t(spark, sf, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS prio,
               CAST(GROUPING(o_orderstatus) AS INT) AS g1,
               CAST(GROUPING(o_orderpriority) AS INT) AS g2,
               COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


def q_stats_aggs(spark, sf):
    """Statistical aggregate surface: stddev/variance/corr/covar."""
    l = _t(spark, sf, "lineitem")
    return l.groupBy("l_returnflag").agg(
        round4(F.stddev_samp("l_quantity")).alias("sd_qty"),
        round4(F.var_samp("l_quantity")).alias("var_qty"),
        round4(F.min("l_quantity")).alias("min_qty"),
        round4(F.max("l_quantity")).alias("max_qty"),
        round4(F.corr("l_quantity", "l_extendedprice")).alias("corr_qp"),
        round4(F.covar_samp("l_quantity", "l_extendedprice")).alias("cov_qp"),
    )


def q_array_agg(spark, sf):
    """Ordered array aggregation (deterministic; H4-fixed collect)."""
    d = _t(spark, sf, "documents").where(F.col("doc_id") < 100)
    return d.groupBy("lang").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list("doc_id")),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("ids_csv"),
        F.count(F.lit(1)).alias("n"),
    )


def q_date_arith(spark, sf):
    """Date arithmetic surface: datediff/quarter/weekday/last_day."""
    l = _t(spark, sf, "lineitem").where(F.col("l_orderkey") <= 500)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.datediff(F.col("l_shipdate"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("epoch_days"),
        F.quarter("l_shipdate").alias("q"),
        F.weekday("l_shipdate").alias("wd"),
        F.dayofmonth(F.last_day("l_shipdate")).alias("eom_day"),
    )


def q_tfidf(spark, sf):
    """TF-IDF document-term weights (reference-adjacent scoring system)."""
    from batch_processing_pipeline_spark.functions.tfidf import tfidf

    d = _t(spark, sf, "documents")
    scored = tfidf(d)
    return scored.select(
        "doc_id", "word", "tf", round4(F.col("tfidf")).alias("w")
    )


def q_pivot(spark, sf):
    """Pivot (dynamic columns from values)."""
    l = _t(spark, sf, "lineitem")
    p = (
        l.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.count(F.lit(1)))
    )
    return p.select(
        "l_returnflag",
        F.coalesce(F.col("F"), F.lit(0)).alias("ls_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("ls_o"),
    )


def q_unpivot(spark, sf):
    """Unpivot / melt (columns to rows)."""
    p = _t(spark, sf, "part").where(F.col("p_partkey") <= 200)
    wide = p.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").cast("double").alias("retailprice"),
    )
    return wide.unpivot(
        ["p_partkey"], ["size", "retailprice"], "metric", "v"
    ).select("p_partkey", "metric", round4(F.col("v")).alias("v"))


def q_percentiles(spark, sf):
    """Exact interpolated percentiles per group."""
    l = _t(spark, sf, "lineitem")
    pct = F.percentile("l_quantity", F.lit([0.25, 0.5, 0.9]))
    return l.groupBy("l_returnflag").agg(
        round4(F.element_at(pct, 1)).alias("p25"),
        round4(F.element_at(pct, 2)).alias("p50"),
        round4(F.element_at(pct, 3)).alias("p90"),
    )


def q_udf_surface(spark, sf):
    """Python UDF + Arrow pandas UDF surface (deterministic arithmetic, so
    still oracle-checkable)."""
    from pyspark.sql.functions import pandas_udf, udf

    @pandas_udf("double")
    def affine(v: pd.Series) -> pd.Series:
        return v * 2.0 + 1.0

    shout = udf(lambda s: s.upper() if s is not None else None, "string")

    e = _events(spark, sf).where(F.col("event_id") < 2000)
    return e.select(
        "event_id",
        round4(affine(F.col("value"))).alias("v2"),
        shout(F.col("event_type")).alias("etype_up"),
    )


def q_salted_agg(spark, sf):
    """Skew-safe salted two-phase aggregation — must equal the plain
    group-by (oracle is the plain SQL)."""
    from batch_processing_pipeline_spark.operators.skew import salted_count, salted_sum

    l = _t(spark, sf, "lineitem")
    key = ["l_orderkey", "l_linenumber"]  # unique row key -> uniform, retry-stable salt
    s = salted_sum(l, ["l_returnflag"], "l_quantity", out_col="sum_qty_raw", salt_key=key)
    c = salted_count(l, ["l_returnflag"], out_col="n", salt_key=key)
    return s.join(c, "l_returnflag").select(
        "l_returnflag", round4(F.col("sum_qty_raw")).alias("sum_qty"), "n"
    )


def q_dedup_embedding(spark, sf):
    """Embedding-cosine near-dup pairs (exact over a bounded scope — the
    oracle ground truth; the LSH scale path is validated against this in
    tests/test_similarity.py)."""
    from batch_processing_pipeline_spark.operators.similarity import embedding_near_dup

    emb = _t(spark, sf, "embeddings").where(F.col("vec_id") < 150)
    return embedding_near_dup(emb, threshold=0.35, use_lsh=False)


def q_dedup_clusters(spark, sf):
    """Connected components over near-dup pairs (bounded scope so the
    DuckDB recursive-CTE oracle can verify the iterative algorithm)."""
    from batch_processing_pipeline_spark.operators.components import connected_components

    d = _t(spark, sf, "documents").where(F.col("doc_id") < 60)
    pairs = ngram_jaccard_pairs(d, shingle_n=3, threshold=0.5)
    return connected_components(pairs).select(
        F.col("node").alias("doc_id"), "component"
    )


def q_curation(spark, sf):
    """The LLM-data-pipeline composed end-to-end: score → quality filter →
    exact dedup → curated corpus with metrics."""
    from batch_processing_pipeline_spark.plans.curation import curate

    d = _t(spark, sf, "documents")
    return curate(d, min_quality=0.5)


def q_curation_report(spark, sf):
    """Per-language accounting of the curated corpus."""
    from batch_processing_pipeline_spark.plans.curation import curate, curation_report

    d = _t(spark, sf, "documents")
    return curation_report(curate(d, min_quality=0.5))


def q_array_funcs(spark, sf):
    """Array function surface beyond explode: size/element_at/max/min/
    contains/slice-sum."""
    emb = _t(spark, sf, "embeddings")
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        round4(F.element_at("embedding", 1).cast("double")).alias("e1"),
        round4(F.array_max("embedding").cast("double")).alias("emax"),
        round4(F.array_min("embedding").cast("double")).alias("emin"),
    )


def q_map_funcs(spark, sf):
    """Map-typed columns: parse JSON props to map<string,int>, inspect."""
    e = _events(spark, sf)
    m = F.from_json(F.col("props"), "map<string,int>")
    return e.select(
        "event_id",
        F.size(F.map_keys(m)).alias("n_keys"),
        F.element_at(m, "k").alias("k_val"),
    )


def q_asof_join(spark, sf):
    """As-of join: each purchase event picks up the user's most recent
    prior error event (engine: union+window composition; oracle: DuckDB's
    native ASOF JOIN)."""
    from batch_processing_pipeline_spark.operators.asof import asof_join

    e = _events(spark, sf)
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    errors = e.where(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts", "value"
    )
    joined = asof_join(
        purchases,
        errors.withColumnRenamed("event_id", "err_event_id"),
        on="user_id",
        right_cols=("err_event_id", "value"),
    )
    return joined.select(
        "event_id",
        "user_id",
        "err_event_id_r",
        round4(F.col("value_r")).alias("err_value"),
        F.unix_timestamp(F.col("ts_r")).alias("err_epoch"),
    )


def q_rank_functions(spark, sf):
    """Full ranking-function surface: dense_rank/percent_rank/cume_dist/
    ntile/first_value (all tie-broken deterministically)."""
    o = _t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.dense_rank().over(w).alias("drk"),
        round4(F.percent_rank().over(w)).alias("prk"),
        round4(F.cume_dist().over(w)).alias("cd"),
        F.ntile(4).over(w).alias("quartile"),
        F.first_value("o_orderkey").over(w).alias("top_order"),
    )


def q_range_window(spark, sf):
    """Time-range window frame (RANGE BETWEEN INTERVAL ... PRECEDING) via
    the SQL entry point."""
    _events(spark, sf).createOrReplaceTempView("events")
    return spark.sql(
        f"""
        SELECT user_id, event_id,
               {R(f"SUM({sql_cents('value')}) OVER (PARTITION BY user_id ORDER BY ts RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) / CAST(100.0 AS DOUBLE)")} AS hour_sum
        FROM events
        """
    )


def q_approx_distinct(spark, sf):
    """HLL++ sketch surface — the count-distinct that works at 100 TB
    (approximate; rows-only check, error bound asserted in tests)."""
    o = _t(spark, sf, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("n_cust_approx"),
        F.count(F.lit(1)).alias("n"),
    )


def q_sim_topk_ivf(spark, sf):
    """IVF (k-means cells) approximate cosine top-10 (rows-only; recall vs
    brute force asserted in tests/test_similarity.py)."""
    from batch_processing_pipeline_spark.operators.ivf import ivf_topk, train_centroids

    emb = _t(spark, sf, "embeddings")
    centroids = train_centroids(emb, k=8, seed=42)
    return ivf_topk(emb.where(F.col("vec_id") < 5), emb, centroids, k=10, nprobe=3)


# =====================================================================
# Oracle SQL (DuckDB dialect)
# =====================================================================

_EN = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
_STOP_LISTS = {k: ", ".join(f"'{w}'" for w in v) for k, v in STOPWORDS.items()}

_PUNCT = r"CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE) / CAST(length(text) AS DOUBLE)"
_MWL = "CAST(list_sum(list_transform(toks, w -> length(w))) AS DOUBLE) / CAST(len(toks) AS DOUBLE)"
_QUALITY = (
    "0.4 * least(1.0, CAST(length(text) AS DOUBLE) / 200.0) "
    f"+ 0.3 * greatest(0.0, least(1.0, (({_MWL}) - 2.0) / 6.0)) "
    f"+ 0.3 * (1.0 - least(1.0, 4.0 * ({_PUNCT})))"
)

_TEXT_STATS_ORACLE = f"""
WITH t AS (
  SELECT doc_id, text,
         regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
  FROM documents
)
SELECT doc_id,
       length(text) AS n_chars_m,
       CAST(len(toks) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS BIGINT) AS bpe_tokens,
       {R(f"CASE WHEN length(text) > 0 THEN {_PUNCT} ELSE 0.0 END")} AS punct_r,
       {R(f"CASE WHEN len(list_distinct(toks)) > 0 THEN CAST(len(list_intersect(list_distinct(toks), [{_EN}])) AS DOUBLE) / CAST(len(list_distinct(toks)) AS DOUBLE) ELSE 0.0 END")} AS stop_r,
       {R(_QUALITY)} AS quality
FROM t
"""

_LANGID_ORACLE = f"""
WITH t AS (
  SELECT doc_id,
         list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+')) AS toks
  FROM documents
), s AS (
  SELECT doc_id,
         len(list_intersect(toks, [{_STOP_LISTS["de"]}])) AS s_de,
         len(list_intersect(toks, [{_STOP_LISTS["en"]}])) AS s_en,
         len(list_intersect(toks, [{_STOP_LISTS["es"]}])) AS s_es,
         len(list_intersect(toks, [{_STOP_LISTS["fr"]}])) AS s_fr
  FROM t
)
SELECT doc_id,
       CASE WHEN greatest(s_de, s_en, s_es, s_fr) <= 0 THEN 'und'
            WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
            WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
            WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
            ELSE 'fr' END AS lang_pred
FROM s
"""

_JACC = (
    "CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)"
    " / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE)"
)
_JACCARD_ORACLE = f"""
WITH sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, length(lower(trim(text))) - 1),
                                      i -> substring(lower(trim(text)), i, 3))) AS sh
  FROM documents
  WHERE doc_id < 60 AND length(lower(trim(text))) >= 3
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       {R(_JACC)} AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE {R(_JACC)} >= 0.5
"""

_FINGERPRINT_ORACLE = """
SELECT doc_id,
       md5(lower(trim(text))) AS fp,
       CASE WHEN length(lower(trim(text))) >= 5
            THEN list_aggregate(
                   list_transform(range(1, length(lower(trim(text))) - 3),
                                  i -> md5(substring(lower(trim(text)), i, 5))),
                   'min')
            ELSE md5(lower(trim(text))) END AS shingle_fp
FROM documents
"""

_COS = (
    "list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),"
    " CAST(c.embedding AS DOUBLE[]))"
)
_SIM_TOPK_ORACLE = f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {R(_COS)} AS cosine
  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
  WHERE q.vec_id < 5
), ranked AS (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id ASC) AS rk
  FROM scored
)
SELECT query_id, rk, neighbor_id, cosine FROM ranked WHERE rk <= 10
"""

ORACLES.update({
    "dq01_scan_project": "SELECT r_regionkey, r_name FROM region",
    "dq02_filter": f"""
        SELECT o_orderkey, {R("o_totalprice")} AS price
        FROM orders WHERE o_orderstatus = 'F' AND o_totalprice > 1000.0
    """,
    "dq03_normalize": """
        SELECT doc_id, substring(lower(trim(text)), 1, 500) AS q
        FROM documents WHERE text IS NOT NULL AND length(trim(text)) >= 2
    """,
    "dq04_prefix_fanout": """
        SELECT d.doc_id, substring(lower(trim(d.text)), 1, k.k) AS prefix
        FROM documents d
        CROSS JOIN (VALUES (2),(3),(4),(5),(6),(7),(8)) AS k(k)
        WHERE length(trim(d.text)) >= k.k
    """,
    "dq05_agg_sum": f"""
        SELECT l_returnflag, l_linestatus,
               {R("SUM(l_quantity)")}      AS sum_qty,
               {R(sql_sum_money('l_extendedprice'))} AS sum_price,
               {R(f"SUM({sql_cents('l_discount')}) / (CAST(100.0 AS DOUBLE) * COUNT(*))")}      AS avg_disc,
               COUNT(*)                    AS n
        FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    "dq06_distinct": """
        SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_cust
        FROM orders GROUP BY o_orderstatus
    """,
    "dq07_join_inner": f"""
        SELECT c.c_mktsegment, COUNT(*) AS n, {R(sql_sum_money('o.o_totalprice'))} AS total
        FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
    """,
    "dq08_join_multiway": """
        SELECT r.r_name, n.n_name, COUNT(o.o_orderkey) AS orders_n
        FROM region r
        JOIN nation n   ON n.n_regionkey = r.r_regionkey
        JOIN customer c ON c.c_nationkey = n.n_nationkey
        JOIN orders o   ON o.o_custkey   = c.c_custkey
        GROUP BY r.r_name, n.n_name
    """,
    "dq09_join_left_null": """
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey HAVING COUNT(o.o_orderkey) = 0
    """,
    "dq10_semi_join": """
        SELECT s.s_suppkey, s.s_name FROM supplier s
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 45)
    """,
    "dq11_anti_join": """
        SELECT p.p_partkey FROM part p
        WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
    """,
    "dq12_theta_join": """
        SELECT c.c_custkey, COUNT(*) AS n
        FROM customer c JOIN orders o
          ON o.o_custkey = c.c_custkey AND o.o_totalprice > c.c_acctbal
        GROUP BY c.c_custkey
    """,
    "dq13_topk_window": f"""
        SELECT o_custkey, rk, o_orderkey, {R("o_totalprice")} AS price
        FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
          FROM orders
        ) t WHERE rk <= 3
    """,
    "dq14_analytic_window": f"""
        SELECT user_id, event_id,
               {R("value")} AS v,
               {R(f"SUM({sql_cents('value')}) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / CAST(100.0 AS DOUBLE)")} AS running,
               {R("COALESCE(LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 0.0)")} AS prev_v
        FROM events
    """,
    "dq15_sort_limit": f"""
        SELECT o_orderkey, {R("o_totalprice")} AS price
        FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """,
    "dq16_setops": """
        SELECT 'i' AS tag, c_custkey FROM
          (SELECT c_custkey FROM customer WHERE c_acctbal > 0
           INTERSECT
           SELECT o_custkey FROM orders WHERE o_orderstatus = 'O') t
        UNION ALL
        SELECT 'e' AS tag, c_custkey FROM
          (SELECT c_custkey FROM customer
           EXCEPT
           SELECT o_custkey FROM orders) t2
    """,
    "dq17_rollup": """
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS prio,
               CAST(GROUPING(o_orderstatus) AS INTEGER) AS g1,
               CAST(GROUPING(o_orderpriority) AS INTEGER) AS g2,
               COUNT(*) AS n
        FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    "dq18_cube": """
        SELECT COALESCE(l_returnflag, 'ALL') AS rf,
               COALESCE(l_linestatus, 'ALL') AS ls,
               CAST(GROUPING(l_returnflag) AS INTEGER) AS g1,
               CAST(GROUPING(l_linestatus) AS INTEGER) AS g2,
               COUNT(*) AS n
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    "dq19_string_funcs": """
        SELECT p_partkey,
               upper(p_brand)                        AS b_up,
               substring(p_name, 1, 5)               AS name5,
               length(p_name)                        AS name_len,
               replace(p_type, ' ', '_')             AS type_u,
               lpad(CAST(p_size AS VARCHAR), 4, '0') AS size4,
               reverse(p_brand)                      AS b_rev
        FROM part
    """,
    "dq20_datetime": """
        SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS y,
               CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS m,
               COUNT(*) AS n,
               SUM(CAST(ROUND((o_totalprice) * CAST(100.0 AS DOUBLE)) AS BIGINT))
                 / CAST(100.0 AS DOUBLE) AS total
        FROM orders GROUP BY 1, 2
    """,
    "dq21_math": f"""
        SELECT l_orderkey, l_linenumber,
               {R("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS charge,
               CAST(FLOOR(l_quantity) AS BIGINT) AS fq,
               CAST(CEIL(l_quantity) AS BIGINT) AS cq,
               l_orderkey % 7 AS m7,
               {R("SQRT(l_extendedprice)")} AS sq
        FROM lineitem WHERE l_orderkey <= 100
    """,
    "dq22_conditional": """
        SELECT o_orderkey,
               CASE WHEN o_totalprice >= 2000 THEN 'high'
                    WHEN o_totalprice >= 500  THEN 'mid'
                    ELSE 'low' END AS bucket,
               NULLIF(o_orderstatus, 'O') AS st_or_null
        FROM orders
    """,
    "dq23_time_bucket": f"""
        SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS h_epoch,
               event_type, COUNT(*) AS n, {R(sql_sum_money('value'))} AS sv
        FROM events GROUP BY 1, 2
    """,
    "dq24_sessionize": """
        WITH g AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                           - CAST(floor(epoch(LAG(ts) OVER
                               (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT)
                           > 1800
                      OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                      THEN 1 ELSE 0 END AS new_s
          FROM events
        ), s AS (
          SELECT user_id, event_id,
                 SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
          FROM g
        )
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               COUNT(*) AS events_in_session
        FROM s GROUP BY user_id, session_id
    """,
    "dq25_json": """
        SELECT event_id, json_extract_string(props, '$.k') AS k FROM events
    """,
    "dq26_vector_dot": f"""
        SELECT b.vec_id AS qb,
               {R("list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))")} AS dot
        FROM embeddings a CROSS JOIN embeddings b
        WHERE a.vec_id = 0 AND b.vec_id BETWEEN 1 AND 10
    """,
    "dq27_exact_dedup": """
        SELECT lang, COUNT(*) AS total,
               COUNT(DISTINCT lower(trim(text))) AS uniq
        FROM documents GROUP BY lang
    """,
    "dq28_autocomplete_e2e": """
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
          SELECT prefix, query, frequency,
                 ROW_NUMBER() OVER (PARTITION BY prefix
                                    ORDER BY frequency DESC, query ASC) AS rk
          FROM freq
        )
        SELECT prefix, rk, query, frequency FROM ranked WHERE rk <= 3
    """,
    "wordcount": """
        SELECT word, COUNT(*) AS n FROM (
          SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS word
          FROM documents WHERE length(lower(trim(text))) > 0
        ) t GROUP BY word
    """,
    "dedup_exact": """
        SELECT md5(lower(trim(text))) AS fingerprint,
               MIN(doc_id) AS doc_id, COUNT(*) AS group_size
        FROM documents GROUP BY 1
    """,
    "dedup_jaccard_pairs": _JACCARD_ORACLE,
    "dedup_minhash": None,
    "dedup_simhash": None,
    "sim_topk": _SIM_TOPK_ORACLE,
    "sim_topk_lsh": None,
    "text_stats": _TEXT_STATS_ORACLE,
    "text_langid": _LANGID_ORACLE,
    "text_fingerprint": _FINGERPRINT_ORACLE,
    "mm_stats": """
        SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
               sha256(text) AS sha256
        FROM documents
    """,
    "mm_decode": """
        SELECT doc_id,
               CAST(length(text) % 13 + 1 AS INTEGER) AS width,
               CAST(length(text) % 7 + 1 AS INTEGER) AS height,
               CAST((length(text) % 13 + 1) * (length(text) % 7 + 1) AS BIGINT)
                   AS n_pixels
        FROM documents
    """,
    "dq29_grouping_sets": """
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS prio,
               CAST(GROUPING(o_orderstatus) AS INTEGER) AS g1,
               CAST(GROUPING(o_orderpriority) AS INTEGER) AS g2,
               COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    "stats_aggs": f"""
        SELECT l_returnflag,
               {R("stddev_samp(l_quantity)")} AS sd_qty,
               {R("var_samp(l_quantity)")} AS var_qty,
               {R("MIN(l_quantity)")} AS min_qty,
               {R("MAX(l_quantity)")} AS max_qty,
               {R("corr(l_quantity, l_extendedprice)")} AS corr_qp,
               {R("covar_samp(l_quantity, l_extendedprice)")} AS cov_qp
        FROM lineitem GROUP BY l_returnflag
    """,
    "array_agg_ordered": """
        SELECT lang,
               string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS ids_csv,
               COUNT(*) AS n
        FROM documents WHERE doc_id < 100 GROUP BY lang
    """,
    "date_arith": """
        SELECT l_orderkey, l_linenumber,
               date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS epoch_days,
               CAST(EXTRACT(QUARTER FROM l_shipdate) AS INTEGER) AS q,
               CAST(isodow(l_shipdate) - 1 AS INTEGER) AS wd,
               CAST(EXTRACT(DAY FROM last_day(CAST(l_shipdate AS DATE))) AS INTEGER) AS eom_day
        FROM lineitem WHERE l_orderkey <= 500
    """,
    "tfidf": f"""
        WITH tok AS (
          SELECT doc_id,
                 unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS word
          FROM documents WHERE length(lower(trim(text))) > 0
        ), tf AS (
          SELECT doc_id, word, COUNT(*) AS tf FROM tok GROUP BY doc_id, word
        ), dfreq AS (
          SELECT word, COUNT(DISTINCT doc_id) AS df_docs FROM tok GROUP BY word
        ), n AS (
          SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents
        )
        SELECT tf.doc_id, tf.word, tf.tf,
               {R("tf.tf * (ln((1.0 + n.n_docs) / (1.0 + dfreq.df_docs)) + 1.0)")} AS w
        FROM tf JOIN dfreq USING (word) CROSS JOIN n
    """,
    "pivot": """
        SELECT l_returnflag,
               COUNT(*) FILTER (WHERE l_linestatus = 'F') AS ls_f,
               COUNT(*) FILTER (WHERE l_linestatus = 'O') AS ls_o
        FROM lineitem GROUP BY l_returnflag
    """,
    "unpivot": f"""
        SELECT p_partkey, 'size' AS metric, {R("CAST(p_size AS DOUBLE)")} AS v
        FROM part WHERE p_partkey <= 200
        UNION ALL
        SELECT p_partkey, 'retailprice' AS metric, {R("p_retailprice")} AS v
        FROM part WHERE p_partkey <= 200
    """,
    "percentiles": f"""
        SELECT l_returnflag,
               {R("quantile_cont(l_quantity, 0.25)")} AS p25,
               {R("quantile_cont(l_quantity, 0.5)")}  AS p50,
               {R("quantile_cont(l_quantity, 0.9)")}  AS p90
        FROM lineitem GROUP BY l_returnflag
    """,
    "udf_surface": f"""
        SELECT event_id, {R("value * 2.0 + 1.0")} AS v2,
               upper(event_type) AS etype_up
        FROM events WHERE event_id < 2000
    """,
    "salted_agg": f"""
        SELECT l_returnflag, {R("SUM(l_quantity)")} AS sum_qty, COUNT(*) AS n
        FROM lineitem GROUP BY l_returnflag
    """,
    "sim_topk_ivf": None,
    "dedup_clusters": f"""
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
        )
        SELECT node AS doc_id, MIN(r) AS component
        FROM reach GROUP BY node
    """,
    "curation": None,  # set below — shares the scored-CTE fragment
    "curation_report": None,  # set below
    "array_funcs": f"""
        SELECT vec_id,
               CAST(len(embedding) AS INTEGER) AS dim,
               {R("CAST(embedding[1] AS DOUBLE)")} AS e1,
               {R("CAST(list_max(embedding) AS DOUBLE)")} AS emax,
               {R("CAST(list_min(embedding) AS DOUBLE)")} AS emin
        FROM embeddings
    """,
    "map_funcs": """
        SELECT event_id,
               CAST(len(json_keys(props)) AS INTEGER) AS n_keys,
               CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
        FROM events
    """,
    "asof_join": f"""
        SELECT l.event_id, l.user_id,
               r.event_id AS err_event_id_r,
               {R("r.value")} AS err_value,
               CAST(floor(epoch(r.ts)) AS BIGINT) AS err_epoch
        FROM (SELECT * FROM events WHERE event_type = 'purchase') l
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') r
          ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
    "rank_functions": f"""
        SELECT o_custkey, o_orderkey,
               DENSE_RANK() OVER w AS drk,
               {R("PERCENT_RANK() OVER w")} AS prk,
               {R("CUME_DIST() OVER w")} AS cd,
               NTILE(4) OVER w AS quartile,
               FIRST_VALUE(o_orderkey) OVER w AS top_order
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_totalprice DESC, o_orderkey ASC)
    """,
    "range_window": f"""
        SELECT user_id, event_id,
               {R(f"SUM({sql_cents('value')}) OVER (PARTITION BY user_id ORDER BY ts RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) / CAST(100.0 AS DOUBLE)")} AS hour_sum
        FROM events
    """,
    "approx_distinct": None,
    "dedup_embedding": f"""
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               {R("list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))")} AS cosine
        FROM embeddings a JOIN embeddings b
          ON a.vec_id < b.vec_id
        WHERE a.vec_id < 150 AND b.vec_id < 150
          AND {R("list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))")} >= 0.35
    """,
})

_LANG_SCORES = " , ".join(
    f"len(list_intersect(dtoks, [{_STOP_LISTS[lang]}])) AS s_{lang}"
    for lang in ("de", "en", "es", "fr")
)
_LANG_CASE = (
    "CASE WHEN greatest(s_de, s_en, s_es, s_fr) <= 0 THEN 'und' "
    "WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de' "
    "WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en' "
    "WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es' "
    "ELSE 'fr' END"
)
_CURATION_SCORED = f"""
WITH t AS (
  SELECT doc_id, text,
         regexp_split_to_array(lower(trim(text)), '\\s+') AS toks,
         list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+')) AS dtoks
  FROM documents
), langscores AS (
  SELECT doc_id, text, toks, {_LANG_SCORES} FROM t
), scored AS (
  SELECT doc_id,
         {R(_QUALITY)} AS quality,
         {_LANG_CASE} AS lang_pred,
         CAST(len(toks) AS BIGINT) AS ws_tokens,
         CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS BIGINT) AS bpe_tokens,
         md5(lower(trim(text))) AS fp
  FROM langscores
), qualified AS (
  SELECT * FROM scored WHERE quality >= 0.5
), survivors AS (
  SELECT fp, MIN(doc_id) AS doc_id, COUNT(*) AS dup_count
  FROM qualified GROUP BY fp
), curated AS (
  SELECT s.doc_id, s.fp AS fingerprint, s.dup_count,
         q.quality, q.lang_pred, q.ws_tokens, q.bpe_tokens
  FROM survivors s JOIN qualified q ON q.doc_id = s.doc_id
)
"""

ORACLES["curation"] = (
    _CURATION_SCORED
    + "SELECT doc_id, fingerprint, dup_count, quality, lang_pred, ws_tokens, bpe_tokens FROM curated"
)
ORACLES["curation_report"] = (
    _CURATION_SCORED
    + f"""
SELECT lang_pred, COUNT(*) AS docs,
       CAST(SUM(ws_tokens) AS BIGINT) AS total_ws_tokens,
       CAST(SUM(bpe_tokens) AS BIGINT) AS total_bpe_tokens,
       {R("AVG(quality)")} AS avg_quality
FROM curated GROUP BY lang_pred
"""
)

QUERIES.update({
    "dq01_scan_project": dq01,
    "dq02_filter": dq02,
    "dq03_normalize": dq03,
    "dq04_prefix_fanout": dq04,
    "dq05_agg_sum": dq05,
    "dq06_distinct": dq06,
    "dq07_join_inner": dq07,
    "dq08_join_multiway": dq08,
    "dq09_join_left_null": dq09,
    "dq10_semi_join": dq10,
    "dq11_anti_join": dq11,
    "dq12_theta_join": dq12,
    "dq13_topk_window": dq13,
    "dq14_analytic_window": dq14,
    "dq15_sort_limit": dq15,
    "dq16_setops": dq16,
    "dq17_rollup": dq17,
    "dq18_cube": dq18,
    "dq19_string_funcs": dq19,
    "dq20_datetime": dq20,
    "dq21_math": dq21,
    "dq22_conditional": dq22,
    "dq23_time_bucket": dq23,
    "dq24_sessionize": dq24,
    "dq25_json": dq25,
    "dq26_vector_dot": dq26,
    "dq27_exact_dedup": dq27,
    "dq28_autocomplete_e2e": dq28,
    "wordcount": q_wordcount,
    "dedup_exact": q_dedup_exact,
    "dedup_jaccard_pairs": q_dedup_jaccard,
    "dedup_minhash": q_dedup_minhash,
    "dedup_simhash": q_dedup_simhash,
    "sim_topk": q_sim_topk,
    "sim_topk_lsh": q_sim_topk_lsh,
    "text_stats": q_text_stats,
    "text_langid": q_text_langid,
    "text_fingerprint": q_text_fingerprint,
    "mm_stats": q_mm_stats,
    "mm_decode": q_mm_decode,
    "dq29_grouping_sets": dq29_grouping_sets,
    "stats_aggs": q_stats_aggs,
    "array_agg_ordered": q_array_agg,
    "date_arith": q_date_arith,
    "tfidf": q_tfidf,
    "pivot": q_pivot,
    "unpivot": q_unpivot,
    "percentiles": q_percentiles,
    "udf_surface": q_udf_surface,
    "salted_agg": q_salted_agg,
    "sim_topk_ivf": q_sim_topk_ivf,
    "rank_functions": q_rank_functions,
    "range_window": q_range_window,
    "approx_distinct": q_approx_distinct,
    "dedup_embedding": q_dedup_embedding,
    "asof_join": q_asof_join,
    "array_funcs": q_array_funcs,
    "map_funcs": q_map_funcs,
    "curation": q_curation,
    "curation_report": q_curation_report,
    "dedup_clusters": q_dedup_clusters,
})


