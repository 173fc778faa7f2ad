"""Query registry: every operator the engine claims, as a runnable query.

Each entry pairs a PySpark implementation (built from the engine's operator
library where one applies, plain declarative DataFrame code otherwise) with
an equivalent DuckDB oracle SQL string. The driver runs both at sf=0.01 and
hash-compares results, so every computed column is aliased identically on
both sides, floats go through the portable ``round4`` formula (see
functions/rounding.py — plain ROUND(x,4) is not engine-portable at half-way
boundaries), timestamps are projected to epoch seconds, and every ranking
carries a unique tie-break (determinism contract, SURVEY.md §2.4 /
FIXTURES.md §C).

Entries whose oracle is ``None`` are genuinely hash-dependent or approximate
(MinHash/SimHash/LSH) — the driver records a rows-only check and pytest
validates them against exact ground truth instead.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd  # module-level: pandas_udf type hints resolve from here
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from batch_processing_pipeline_spark.catalog import table_path
from batch_processing_pipeline_spark.functions.rounding import round4, sql_round4
from batch_processing_pipeline_spark.functions.text_analysis import (
    STOPWORDS,
    bpe_ish_token_count,
    language_id,
    punct_ratio,
    quality_score,
    stopword_ratio,
    tokens,
    whitespace_token_count,
)
from batch_processing_pipeline_spark.multimodal.binary_ops import attach_media, media_stats
from batch_processing_pipeline_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_dedup,
    ngram_jaccard_pairs,
    simhash_dedup,
)
from batch_processing_pipeline_spark.operators.prefix import (
    expand_prefixes,
    normalize_queries,
    prefix_frequencies,
)
from batch_processing_pipeline_spark.operators.sessionize import sessionize
from batch_processing_pipeline_spark.operators.similarity import cosine_topk, signlsh_topk
from batch_processing_pipeline_spark.operators.topk import top_k_per_group

R = sql_round4


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(table_path(sf_dir, name))


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events table with its TIMESTAMP(NANOS) parquet column normalized.

    The fixture stores nanosecond timestamps, which Spark's vectorized
    reader rejects; ``nanosAsLong`` reads them as raw nanos and we truncate
    to microseconds — exactly what DuckDB's reader does, so both engines see
    identical microsecond values.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(table_path(sf_dir, "events"))
    if dict(raw.dtypes)["ts"] == "bigint":
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw


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
        round4(F.sum("l_extendedprice")).alias("sum_price"),
        round4(F.avg("l_discount")).alias("avg_disc"),
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
        .agg(F.count(F.lit(1)).alias("n"), round4(F.sum("o_totalprice")).alias("total"))
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
        round4(F.sum("value").over(run)).alias("running"),
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
    """Date/time surface (UTC session — H9)."""
    o = _t(spark, sf, "orders")
    return o.groupBy(
        F.year("o_orderdate").alias("y"), F.month("o_orderdate").alias("m")
    ).agg(F.count(F.lit(1)).alias("n"), round4(F.sum("o_totalprice")).alias("total"))


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
    ).agg(F.count(F.lit(1)).alias("n"), round4(F.sum("value")).alias("sv"))


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
    recall vs brute force asserted in tests/test_similarity.py)."""
    emb = _t(spark, sf, "embeddings")
    return signlsh_topk(
        emb.where(F.col("vec_id") < 5), emb, dim=64, k=10, n_planes=6, n_tables=8
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
               {R("SUM(value) OVER (PARTITION BY user_id ORDER BY ts RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)")} AS hour_sum
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

ORACLES: dict[str, str | None] = {
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
               {R("SUM(l_extendedprice)")} AS sum_price,
               {R("AVG(l_discount)")}      AS avg_disc,
               COUNT(*)                    AS n
        FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    "dq06_distinct": """
        SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_cust
        FROM orders GROUP BY o_orderstatus
    """,
    "dq07_join_inner": f"""
        SELECT c.c_mktsegment, COUNT(*) AS n, {R("SUM(o.o_totalprice)")} AS total
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
               {R("SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")} AS running,
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
    "dq20_datetime": f"""
        SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS y,
               CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS m,
               COUNT(*) AS n, {R("SUM(o_totalprice)")} AS total
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
               event_type, COUNT(*) AS n, {R("SUM(value)")} AS sv
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
               {R("SUM(value) OVER (PARTITION BY user_id ORDER BY ts RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)")} AS hour_sum
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
}

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

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
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
}


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
        round4(F.sum("o_totalprice").over(w)).alias("mov_sum"),
        round4(F.avg("o_totalprice").over(w)).alias("mov_avg"),
    )


ORACLES["window_frames"] = f"""
    SELECT o_custkey, o_orderkey,
           {R("SUM(o_totalprice) OVER w")} AS mov_sum,
           {R("AVG(o_totalprice) OVER w")} AS mov_avg
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
            F.sum(F.when(F.col("o_orderpriority") == "1-URGENT", F.col("o_totalprice")))
        ).alias("sum_urgent"),
        F.count(F.lit(1)).alias("n"),
    )


ORACLES["filtered_aggs"] = f"""
    SELECT o_orderstatus,
           COUNT(*) FILTER (WHERE o_totalprice > 150000.0) AS n_big,
           {R("SUM(o_totalprice) FILTER (WHERE o_orderpriority = '1-URGENT')")}
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
            round4(F.sum("value")).alias("sum_value"),
        )
    )


ORACLES["time_rollup"] = f"""
    SELECT strftime(ts, '%Y-%m-%d') AS day,
           strftime(ts, '%Y-%m-%d %H:00') AS hour,
           CAST(COUNT(*) AS BIGINT) AS n,
           {R("SUM(value)")} AS sum_value
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
    cusum). Running sums are computed IN frame order on both engines, so
    the float arithmetic is order-deterministic and hash-comparable."""
    e = _events(spark, sf)
    w_mean = Window.partitionBy("event_type")
    w_run = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dev = F.col("value") - F.avg("value").over(w_mean)
    return e.select(
        "event_id",
        "event_type",
        round4(F.sum(dev).over(w_run)).alias("cusum"),
    )


ORACLES["cusum"] = f"""
    SELECT event_id, event_type,
           {R("SUM(value - type_mean) OVER (PARTITION BY event_type"
              " ORDER BY ts, event_id"
              " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")} AS cusum
    FROM (
      SELECT event_id, event_type, ts, value,
             AVG(value) OVER (PARTITION BY event_type) AS type_mean
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
    vocab = toks.groupBy("w").agg(F.count(F.lit(1)).alias("n_w"))
    total = toks.agg(F.count(F.lit(1)).cast("double").alias("n_total"))
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
    """
    o = _t(spark, sf, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).cast("long").alias("freq"),
        F.sum("o_totalprice").alias("monetary"),
    )
    anchor = o.agg(F.max("o_orderdate").alias("max_date"))
    rfm = per_cust.crossJoin(F.broadcast(anchor)).select(
        "o_custkey",
        F.datediff("max_date", "last_order").cast("long").alias("recency_days"),
        "freq",
        "monetary",
    )
    bounds = rfm.agg(
        *[
            F.percentile(c, F.lit(q)).alias(f"_{c}{i}")
            for c in ("recency_days", "freq", "monetary")
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
        round4(F.col("monetary")).alias("monetary"),
        # low recency = GOOD, so the r score inverts the tercile
        (F.lit(4) - score("recency_days")).cast("int").alias("r_score"),
        score("freq").alias("f_score"),
        score("monetary").alias("m_score"),
    )


ORACLES["rfm_scores"] = f"""
    WITH per_cust AS (
      SELECT o_custkey, MAX(o_orderdate) AS last_order,
             CAST(COUNT(*) AS BIGINT) AS freq, SUM(o_totalprice) AS monetary
      FROM orders GROUP BY o_custkey
    ), anchor AS (SELECT MAX(o_orderdate) AS max_date FROM orders),
    rfm AS (
      SELECT o_custkey,
             CAST(date_diff('day', last_order, max_date) AS BIGINT) AS recency_days,
             freq, monetary
      FROM per_cust CROSS JOIN anchor
    ), b AS (
      SELECT quantile_cont(recency_days, 1.0/3) AS r1, quantile_cont(recency_days, 2.0/3) AS r2,
             quantile_cont(freq, 1.0/3)         AS f1, quantile_cont(freq, 2.0/3)         AS f2,
             quantile_cont(monetary, 1.0/3)     AS m1, quantile_cont(monetary, 2.0/3)     AS m2
      FROM rfm
    )
    SELECT o_custkey, recency_days, freq, {R("monetary")} AS monetary,
           CAST(4 - (1 + (CASE WHEN recency_days > r1 THEN 1 ELSE 0 END)
                       + (CASE WHEN recency_days > r2 THEN 1 ELSE 0 END)) AS INTEGER) AS r_score,
           CAST(1 + (CASE WHEN freq > f1 THEN 1 ELSE 0 END)
                  + (CASE WHEN freq > f2 THEN 1 ELSE 0 END) AS INTEGER) AS f_score,
           CAST(1 + (CASE WHEN monetary > m1 THEN 1 ELSE 0 END)
                  + (CASE WHEN monetary > m2 THEN 1 ELSE 0 END) AS INTEGER) AS m_score
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
        .agg(F.count(F.lit(1)).alias("n"), round4(F.sum("value")).alias("sv"))
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
    SELECT w_start, event_type, COUNT(*) AS n, {R("SUM(value)")} AS sv
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
    tie = F.md5(F.encode(F.col("pair"), "UTF-8"))
    wr = Window.partitionBy().orderBy(F.desc("cnt"), tie.asc())
    return (
        pairs.withColumn("rk", F.row_number().over(wr))
        .where(F.col("rk") <= 20)
        .select(F.col("rk").cast("int").alias("rk"), "pair", "cnt")
    )


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
            F.sum("value").alias("sv"),
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
        sums=("n", "sv"),
        mins=("mn",),
        maxs=("mx",),
        latest=("last_value",),
        ts_col="ts",
        id_col="event_id",
    )
    return merged.select(
        "event_type", "n", round4(F.col("sv")).alias("sv"),
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
    SELECT e.event_type, COUNT(*) AS n, {R("SUM(e.value)")} AS sv,
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
    wr = Window.partitionBy().orderBy(F.desc("n"), F.asc("ngram"))
    return (
        counted.withColumn("rk", F.row_number().over(wr))
        .where(F.col("rk") <= 25)
        .select(F.col("rk").cast("int").alias("rk"), "ngram", "n")
    )


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
    relations stay exact; only the 6-value boundary row is approximate."""
    o = _t(spark, sf, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).cast("long").alias("freq"),
        F.sum("o_totalprice").alias("monetary"),
    )
    anchor = o.agg(F.max("o_orderdate").alias("max_date"))
    rfm = per_cust.crossJoin(F.broadcast(anchor)).select(
        "o_custkey",
        F.datediff("max_date", "last_order").cast("long").alias("recency_days"),
        "freq",
        "monetary",
    )
    bounds = rfm.agg(
        *[
            F.approx_percentile(c, F.lit(q), F.lit(10000)).alias(f"_{c}{i}")
            for c in ("recency_days", "freq", "monetary")
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
        round4(F.col("monetary")).alias("monetary"),
        (F.lit(4) - score("recency_days")).cast("int").alias("r_score"),
        score("freq").alias("f_score"),
        score("monetary").alias("m_score"),
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


# =====================================================================
# Round-3 surface additions
# =====================================================================


def q_decontaminate_embedding(spark, sf):
    """Embedding-space benchmark decontamination — the semantic twin of
    the n-gram ``decontaminate`` op: flag corpus vectors whose cosine
    similarity to ANY eval-set vector reaches 0.30 (eval set = vec_id <
    25, the held-out benchmark; corpus = the rest). Paraphrased
    contamination that shares no 24-char-gram still lands here.

    Scale shape: the eval set is small by nature — its dim-exploded
    relation BROADCASTS, so the corpus never shuffles for the join; the
    (corpus_id, eval_id) dot products form map-side-combining partial
    aggregates, and corpus norms are one more partial agg. Everything is
    whole-stage codegen (posexplode + equi-join + SUM), no interpreted
    array lambdas on the corpus side — same bulk formulation as
    ``embed_centroid_dist``. Cosines are rounded (round4) BEFORE the
    threshold on both engines so partial-sum order cannot flip a
    boundary pair.
    """
    e = _t(spark, sf, "embeddings")
    dims = e.select(
        "vec_id", F.posexplode("embedding").alias("pos", "v")
    ).select("vec_id", "pos", F.col("v").cast("double").alias("v"))
    eval_dims = dims.where(F.col("vec_id") < 25).select(
        F.col("vec_id").alias("eval_id"), "pos", F.col("v").alias("ev")
    )
    corpus_dims = dims.where(F.col("vec_id") >= 25)
    norms = dims.groupBy("vec_id").agg(F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("nrm"))
    eval_norms = norms.where(F.col("vec_id") < 25).select(
        F.col("vec_id").alias("eval_id"), F.col("nrm").alias("e_nrm")
    )
    corpus_norms = norms.where(F.col("vec_id") >= 25)
    dots = (
        corpus_dims.join(F.broadcast(eval_dims), "pos")
        .groupBy("vec_id", "eval_id")
        .agg(F.sum(F.col("v") * F.col("ev")).alias("dot"))
    )
    cos = (
        dots.join(corpus_norms, "vec_id")
        .join(F.broadcast(eval_norms), "eval_id")
        .select(
            "vec_id",
            "eval_id",
            round4(F.col("dot") / (F.col("nrm") * F.col("e_nrm"))).alias("sim"),
        )
        .where(F.col("sim") >= 0.30)
    )
    return cos.groupBy("vec_id").agg(
        F.count(F.lit(1)).alias("n_evals_matched"),
        F.max("sim").alias("max_sim"),
    )


ORACLES["decontaminate_embedding"] = f"""
    WITH n AS (
      SELECT vec_id,
             CAST(embedding AS DOUBLE[]) AS e,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                   CAST(embedding AS DOUBLE[]))) AS nrm
      FROM embeddings
    ), pairs AS (
      SELECT c.vec_id,
             {R("list_dot_product(c.e, b.e) / (c.nrm * b.nrm)")} AS sim
      FROM n c CROSS JOIN n b
      WHERE c.vec_id >= 25 AND b.vec_id < 25
    )
    SELECT vec_id, COUNT(*) AS n_evals_matched, MAX(sim) AS max_sim
    FROM pairs WHERE sim >= CAST(0.30 AS DOUBLE)
    GROUP BY vec_id
"""
QUERIES["decontaminate_embedding"] = q_decontaminate_embedding


def q_referential_integrity(spark, sf):
    """Foreign-key integrity audit across the star schema — the data-
    quality gate a 100 TB ingest runs before anything joins: per
    relationship, total child rows, distinct child keys, and orphan rows
    (child keys with no parent).

    Scale shape: each check projects the child to its key column FIRST,
    so the anti-join shuffles bare keys, never fact rows; parents reduce
    to distinct-key relations. The seven audit rows union into one tiny
    result.
    """
    def audit(name, child, ckey, parent, pkey):
        keys = child.select(F.col(ckey).alias("k"))
        parents = parent.select(F.col(pkey).alias("k")).distinct()
        orphans = keys.join(parents, "k", "left_anti")
        return (
            keys.agg(
                F.count(F.lit(1)).alias("child_rows"),
                F.countDistinct("k").alias("child_keys"),
            )
            .crossJoin(orphans.agg(F.count(F.lit(1)).alias("orphan_rows")))
            .select(F.lit(name).alias("fk"), "child_rows", "child_keys", "orphan_rows")
        )

    o = _t(spark, sf, "orders")
    l = _t(spark, sf, "lineitem")
    c = _t(spark, sf, "customer")
    s = _t(spark, sf, "supplier")
    p = _t(spark, sf, "part")
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region")
    checks = [
        audit("customer->nation", c, "c_nationkey", n, "n_nationkey"),
        audit("lineitem->orders", l, "l_orderkey", o, "o_orderkey"),
        audit("lineitem->part", l, "l_partkey", p, "p_partkey"),
        audit("lineitem->supplier", l, "l_suppkey", s, "s_suppkey"),
        audit("nation->region", n, "n_regionkey", r, "r_regionkey"),
        audit("orders->customer", o, "o_custkey", c, "c_custkey"),
        audit("supplier->nation", s, "s_nationkey", n, "n_nationkey"),
    ]
    out = checks[0]
    for df in checks[1:]:
        out = out.unionByName(df)
    return out


ORACLES["referential_integrity"] = """
    WITH rel AS (
      SELECT 'customer->nation' AS fk, c_nationkey AS k FROM customer
      UNION ALL SELECT 'lineitem->orders', l_orderkey FROM lineitem
      UNION ALL SELECT 'lineitem->part', l_partkey FROM lineitem
      UNION ALL SELECT 'lineitem->supplier', l_suppkey FROM lineitem
      UNION ALL SELECT 'nation->region', n_regionkey FROM nation
      UNION ALL SELECT 'orders->customer', o_custkey FROM orders
      UNION ALL SELECT 'supplier->nation', s_nationkey FROM supplier
    ), parents AS (
      SELECT 'customer->nation' AS fk, n_nationkey AS k FROM nation
      UNION ALL SELECT 'lineitem->orders', o_orderkey FROM orders
      UNION ALL SELECT 'lineitem->part', p_partkey FROM part
      UNION ALL SELECT 'lineitem->supplier', s_suppkey FROM supplier
      UNION ALL SELECT 'nation->region', r_regionkey FROM region
      UNION ALL SELECT 'orders->customer', c_custkey FROM customer
      UNION ALL SELECT 'supplier->nation', n_nationkey FROM nation
    )
    SELECT r.fk,
           COUNT(*) AS child_rows,
           COUNT(DISTINCT r.k) AS child_keys,
           COUNT(*) FILTER (WHERE NOT EXISTS (
             SELECT 1 FROM parents p WHERE p.fk = r.fk AND p.k = r.k
           )) AS orphan_rows
    FROM rel r
    GROUP BY r.fk
"""
QUERIES["referential_integrity"] = q_referential_integrity


def q_latest_per_key(spark, sf):
    """CDC snapshot compaction: collapse an event stream to the LATEST row
    per key — the standard change-log → current-state materialization.

    Scale shape: ``max_by`` over a single sortable version key — a plain
    hash aggregate with map-side partial ``max_by`` combine, NO window
    sort and no per-key row buffering (the ``row_number() = 1``
    formulation sorts every partition; this one keeps a single candidate
    per key per partition). The version key packs (epoch seconds,
    event_id) into one BIGINT so both engines order identically and ties
    break deterministically.
    """
    e = _events(spark, sf)
    ver = (
        F.floor(F.unix_timestamp("ts")) * F.lit(10_000_000) + F.col("event_id")
    ).cast("long")
    return e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_versions"),
        F.max(ver).alias("last_ver"),
        F.max_by("event_type", ver).alias("last_event_type"),
        round4(F.max_by(F.col("value"), ver)).alias("last_value"),
    )


ORACLES["latest_per_key"] = f"""
    SELECT user_id,
           COUNT(*) AS n_versions,
           MAX(CAST(floor(epoch(ts)) AS BIGINT) * 10000000 + event_id) AS last_ver,
           arg_max(event_type,
                   CAST(floor(epoch(ts)) AS BIGINT) * 10000000 + event_id)
               AS last_event_type,
           {R("arg_max(value, CAST(floor(epoch(ts)) AS BIGINT) * 10000000 + event_id)")}
               AS last_value
    FROM events
    GROUP BY user_id
"""
QUERIES["latest_per_key"] = q_latest_per_key


def q_variant_funcs(spark, sf):
    """VariantType semi-structured surface (Spark 4): ``parse_json`` into
    an open-schema variant, typed ``variant_get`` extraction by path.
    Variant is the scale answer to schema-drifting JSON: one binary-
    encoded column, per-path typed reads, no full from_json schema
    declaration. The document is concat-built on both sides (same
    isolation discipline as ``json_funcs``); the oracle extracts the same
    paths with DuckDB's JSON operators.
    """
    o = _t(spark, sf, "orders")
    js = F.concat(
        F.lit('{"status": "'),
        F.col("o_orderstatus"),
        F.lit('", "n": '),
        (F.col("o_orderkey") % 97).cast("string"),
        F.lit(', "nested": {"pri": "'),
        F.col("o_orderpriority"),
        F.lit('"}}'),
    )
    v = F.parse_json(js)
    return o.select(
        "o_orderkey",
        F.variant_get(v, "$.status", "string").alias("status"),
        F.variant_get(v, "$.n", "long").alias("n"),
        F.variant_get(v, "$.nested.pri", "string").alias("pri"),
    )


ORACLES["variant_funcs"] = """
    WITH j AS (
      SELECT o_orderkey,
             '{"status": "' || o_orderstatus || '", "n": '
             || CAST(o_orderkey % 97 AS VARCHAR)
             || ', "nested": {"pri": "' || o_orderpriority || '"}}' AS js
      FROM orders
    )
    SELECT o_orderkey,
           json_extract_string(js, '$.status') AS status,
           CAST(json_extract(js, '$.n') AS BIGINT) AS n,
           json_extract_string(js, '$.nested.pri') AS pri
    FROM j
"""
QUERIES["variant_funcs"] = q_variant_funcs


def q_sql_pipe(spark, sf):
    """SQL pipe syntax (Spark 4 ``|>`` operators) through the ``spark.sql``
    entry point — the linear form of filter → aggregate → filter. The
    oracle is the identical plain-SQL query, so the pipe parse is pinned
    to classic semantics.
    """
    _t(spark, sf, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        FROM orders_v
        |> WHERE o_totalprice > 1000.0
        |> AGGREGATE COUNT(*) AS n,
                     SUM(FLOOR(o_totalprice)) AS total_fl
           GROUP BY o_orderstatus, o_orderpriority
        |> WHERE n >= 5
        """
    )


ORACLES["sql_pipe"] = """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           CAST(SUM(FLOOR(o_totalprice)) AS BIGINT) AS total_fl
    FROM orders
    WHERE o_totalprice > CAST(1000.0 AS DOUBLE)
    GROUP BY o_orderstatus, o_orderpriority
    HAVING COUNT(*) >= 5
"""
QUERIES["sql_pipe"] = q_sql_pipe


def q_lateral_join(spark, sf):
    """Correlated LATERAL subquery (per-customer aggregate over their own
    orders) — the SQL-standard form of "for each row, run this dependent
    subquery". Catalyst decorrelates it into an aggregate + equi-join, so
    the plan scales like the pre-aggregation it is; the oracle runs the
    identical LATERAL in DuckDB.
    """
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    c.createOrReplaceTempView("customer_v")
    o.createOrReplaceTempView("orders_v2")
    return spark.sql(
        """
        SELECT c.c_custkey, l.n_orders, l.best_fl
        FROM customer_v c,
        LATERAL (
          SELECT COUNT(*) AS n_orders,
                 MAX(FLOOR(o.o_totalprice)) AS best_fl
          FROM orders_v2 o WHERE o.o_custkey = c.c_custkey
        ) l
        WHERE l.n_orders > 0
        """
    )


ORACLES["lateral_join"] = """
    SELECT c.c_custkey, l.n_orders, CAST(l.best_fl AS BIGINT) AS best_fl
    FROM customer c,
    LATERAL (
      SELECT COUNT(*) AS n_orders, MAX(FLOOR(o.o_totalprice)) AS best_fl
      FROM orders o WHERE o.o_custkey = c.c_custkey
    ) l
    WHERE l.n_orders > 0
"""
QUERIES["lateral_join"] = q_lateral_join


def q_try_funcs(spark, sf):
    """Error-safe arithmetic/cast surface (``try_divide``, ``try_cast``,
    ``try_add``): NULL on failure instead of a job-killing ANSI error —
    at 100 TB one malformed row must not abort an hours-long job, and
    filters on the NULL results quarantine the bad rows for audit.
    DuckDB's TRY_CAST / NULLIF-guarded division are the oracle twins.
    """
    o = _t(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        round4(F.try_divide(F.col("o_totalprice"), F.col("o_orderkey") % 7)).alias(
            "per_bucket"
        ),
        F.substring("o_orderpriority", 1, 1).try_cast("long").alias("pri_n"),
        F.lit("not-a-number").try_cast("long").alias("bad_cast"),
        F.try_add(F.col("o_orderkey"), F.lit(9223372036854775807)).alias("overflow"),
    )


ORACLES["try_funcs"] = f"""
    SELECT o_orderkey,
           {R("o_totalprice / NULLIF(o_orderkey % 7, 0)")} AS per_bucket,
           TRY_CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS pri_n,
           TRY_CAST('not-a-number' AS BIGINT) AS bad_cast,
           CASE WHEN o_orderkey = 0 THEN 9223372036854775807 END AS overflow
    FROM orders
"""
QUERIES["try_funcs"] = q_try_funcs


def q_param_sql(spark, sf):
    """Parameterized SQL through the ``spark.sql(query, args=...)`` entry
    point — named markers bind typed literals server-side (no string
    splicing, no injection), the templating surface a query service needs.
    The oracle inlines the same constants.
    """
    _t(spark, sf, "orders").createOrReplaceTempView("orders_p")
    return spark.sql(
        """
        SELECT o_orderstatus, COUNT(*) AS n,
               SUM(FLOOR(o_totalprice)) AS total_fl
        FROM orders_p
        WHERE o_totalprice BETWEEN :lo AND :hi AND o_orderpriority <> :skip
        GROUP BY o_orderstatus
        """,
        args={"lo": 500.0, "hi": 2000.0, "skip": "1-URGENT"},
    )


ORACLES["param_sql"] = """
    SELECT o_orderstatus, COUNT(*) AS n,
           CAST(SUM(FLOOR(o_totalprice)) AS BIGINT) AS total_fl
    FROM orders
    WHERE o_totalprice BETWEEN CAST(500.0 AS DOUBLE) AND CAST(2000.0 AS DOUBLE)
      AND o_orderpriority <> '1-URGENT'
    GROUP BY o_orderstatus
"""
QUERIES["param_sql"] = q_param_sql


def q_arrow_map(spark, sf):
    """``mapInArrow`` — the lowest-overhead Python escape hatch: batches
    arrive as Arrow RecordBatches (zero-copy columnar, no pandas
    conversion), vectorized numpy math, Arrow back out. The deterministic
    kernel (charge = price x (1-disc) x (1+tax), floored) is oracle-
    recomputable, so the Arrow path's semantics are hash-pinned.

    Scale note: prefer built-in column expressions when they can express
    the kernel (this one could be — the query exists to pin the Arrow
    batch contract); when Python IS required, mapInArrow beats
    row-at-a-time UDFs by orders of magnitude and mapInPandas by the
    pandas materialization cost.
    """
    import pyarrow as pa

    l = _t(spark, sf, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_tax"
    )

    def kernel(batches):
        for batch in batches:
            price = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
            disc = batch.column("l_discount").to_numpy(zero_copy_only=False)
            tax = batch.column("l_tax").to_numpy(zero_copy_only=False)
            charge = (price * (1.0 - disc) * (1.0 + tax)) // 1.0
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("l_orderkey"),
                    batch.column("l_linenumber"),
                    pa.array(charge, type=pa.float64()),
                ],
                names=["l_orderkey", "l_linenumber", "charge_fl"],
            )

    return l.mapInArrow(
        kernel, "l_orderkey long, l_linenumber int, charge_fl double"
    )


ORACLES["arrow_map"] = """
    SELECT l_orderkey, l_linenumber,
           FLOOR(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount)
                 * (CAST(1.0 AS DOUBLE) + l_tax)) AS charge_fl
    FROM lineitem
"""
QUERIES["arrow_map"] = q_arrow_map


def q_bitwise_funcs(spark, sf):
    """Bitwise expression + aggregate surface: per-status bitmaps composed
    with ``bit_or``/``bit_and``/``bit_xor`` over shifted flags — the
    roll-your-own-bitmap primitive (feature flags, day-of-week presence,
    shard masks) that replaces a 64-row-per-key relation with one long.
    Map-side partial combine applies (bit ops are commutative/associative
    merges, the same property the state-store merges exploit).
    """
    o = _t(spark, sf, "orders")
    # pyspark's shiftleft() only takes a literal count — the column-count
    # form goes through the SQL function
    flag = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(o_orderkey % 7 AS INT))")
    return o.groupBy("o_orderstatus").agg(
        F.bit_or(flag).alias("seen_mask"),
        F.bit_and(flag + F.lit(1)).alias("and_mask"),
        F.bit_xor(flag).alias("xor_mask"),
        F.sum(F.bit_count(flag)).alias("total_bits"),
    )


ORACLES["bitwise_funcs"] = """
    SELECT o_orderstatus,
           bit_or(CAST(1 AS BIGINT) << CAST(o_orderkey % 7 AS INTEGER)) AS seen_mask,
           bit_and((CAST(1 AS BIGINT) << CAST(o_orderkey % 7 AS INTEGER)) + 1) AS and_mask,
           bit_xor(CAST(1 AS BIGINT) << CAST(o_orderkey % 7 AS INTEGER)) AS xor_mask,
           CAST(SUM(bit_count(CAST(1 AS BIGINT) << CAST(o_orderkey % 7 AS INTEGER))) AS BIGINT) AS total_bits
    FROM orders
    GROUP BY o_orderstatus
"""
QUERIES["bitwise_funcs"] = q_bitwise_funcs


def q_hll_union(spark, sf):
    """Mergeable HLL sketches (Datasketches ``hll_sketch_agg`` /
    ``hll_union_agg``): build per-day-parity sketches of each event
    type's users, then UNION THE SKETCHES — the incremental
    count-distinct: daily batches keep a tiny sketch column in state and
    merging them equals sketching the whole history (no re-scan, the
    property plain approx_count_distinct doesn't expose). Sketch binaries
    are engine-specific → rows-only in the harness; pytest pins
    merged-estimate == whole-corpus estimate and the error bound vs exact.
    """
    e = _events(spark, sf).select(
        "event_type", "user_id",
        (F.floor(F.unix_timestamp("ts") / F.lit(86400)) % 2).alias("_half"),
    )
    halves = e.groupBy("event_type", "_half").agg(
        F.hll_sketch_agg("user_id").alias("sketch")
    )
    merged = halves.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est_users")
    )
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return merged.join(exact, "event_type").select(
        "event_type", "est_users", "exact_users"
    )


ORACLES["hll_union"] = None
QUERIES["hll_union"] = q_hll_union


def q_bpe_encode(spark, sf):
    """Full BPE tokenizer round: train 20 merges on the corpus' Zipf-
    compact vocabulary (driver-side, as production tokenizer trainers
    do), broadcast the rank table, and APPLY it distributed via an
    Arrow-batched pandas UDF with an executor-local distinct-word cache
    (functions/bpe.py) — the training-data tokenization pass at 100 TB.
    Deterministic (tie-broken training) but not SQL-expressible →
    rows-only in the harness; golden merges, round-trip, and cache
    semantics pinned in tests/test_text_analysis.py.
    """
    from batch_processing_pipeline_spark.functions.bpe import (
        bpe_encode,
        learn_bpe_merges,
    )

    d = _t(spark, sf, "documents")
    merges = learn_bpe_merges(d, "text", n_merges=20)
    enc = bpe_encode(d.select("doc_id", "text"), merges)
    return enc.select(
        "doc_id",
        F.size("bpe_tokens").alias("n_bpe"),
        F.element_at("bpe_tokens", 1).alias("first_tok"),
    )


ORACLES["bpe_encode"] = None
QUERIES["bpe_encode"] = q_bpe_encode


def q_codec_funcs(spark, sf):
    """Content-addressing / encoding surface: md5, sha2-256, hex, base64.
    The digest functions are what exact-dedup fingerprints and
    cache/content-addressed storage keys are built from — pinned here
    cross-engine so the internal uses (operators/dedup.py) stay on
    portable semantics.
    """
    d = _t(spark, sf, "documents").where(F.col("doc_id") < 100)
    t = F.col("text")
    return d.select(
        "doc_id",
        F.md5(t).alias("md5_hex"),
        F.sha2(t, 256).alias("sha256_hex"),
        F.hex(t).alias("utf8_hex"),
        # Spark's base64 emits MIME-chunked output (a newline every 76
        # chars) on long inputs; strip to the canonical unchunked form
        F.regexp_replace(F.base64(t.cast("binary")), "[\\r\\n]", "").alias("b64"),
    )


ORACLES["codec_funcs"] = """
    SELECT doc_id,
           md5(text) AS md5_hex,
           sha256(text) AS sha256_hex,
           hex(CAST(text AS BLOB)) AS utf8_hex,
           to_base64(CAST(text AS BLOB)) AS b64
    FROM documents WHERE doc_id < 100
"""
QUERIES["codec_funcs"] = q_codec_funcs


def q_array_lambdas(spark, sf):
    """Higher-order array functions (filter/exists/forall/aggregate) —
    the lambda surface over array columns. Scale note: these run
    interpreted (outside whole-stage codegen); corpus-hot paths in this
    repo use the explode+aggregate bulk forms instead (operators/dedup.py
    docstrings), and this query pins the SEMANTICS of the convenient
    form for bounded relations.
    """
    emb = _t(spark, sf, "embeddings")
    e = F.transform("embedding", lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.size(F.filter(e, lambda x: x > 0)).alias("n_pos"),
        F.exists(e, lambda x: x > F.lit(0.2)).alias("any_big"),
        F.forall(e, lambda x: F.abs(x) <= F.lit(1.0)).alias("all_unit"),
        round4(
            F.aggregate(e, F.lit(0.0), lambda acc, x: acc + F.abs(x))
        ).alias("l1_norm"),
    )


ORACLES["array_lambdas"] = f"""
    WITH t AS (
      SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]), x -> x) AS e
      FROM embeddings
    )
    SELECT vec_id,
           CAST(len(list_filter(e, x -> x > 0)) AS INTEGER) AS n_pos,
           len(list_filter(e, x -> x > CAST(0.2 AS DOUBLE))) > 0 AS any_big,
           len(list_filter(e, x -> NOT (abs(x) <= CAST(1.0 AS DOUBLE)))) = 0 AS all_unit,
           {R("list_sum(list_transform(e, x -> abs(x)))")} AS l1_norm
    FROM t
"""
QUERIES["array_lambdas"] = q_array_lambdas


def q_locf_fill(spark, sf):
    """Last-observation-carried-forward gap fill: per user, carry the
    most recent non-null click value forward over time — the standard
    time-series imputation, expressed as ``last_value(... IGNORE NULLS)``
    over an unbounded-preceding frame. One window pass, no self-join.
    """
    e = _events(spark, sf)
    click_val = F.when(F.col("event_type") == "click", F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.last(click_val, ignorenulls=True).over(w).alias("locf_raw"),
    ).select(
        "user_id", "event_id", round4(F.col("locf_raw")).alias("last_click_v")
    )


ORACLES["locf_fill"] = f"""
    SELECT user_id, event_id,
           {R("last_value(CASE WHEN event_type = 'click' THEN value END IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")}
               AS last_click_v
    FROM events
"""
QUERIES["locf_fill"] = q_locf_fill


def q_moving_median(spark, sf):
    """Rolling median over a trailing 9-row window per event type — the
    robust smoother (spike-resistant, unlike moving average) for noisy
    telemetry. Exact windowed percentile buffers only the frame (9
    values), so unlike a global percentile this is scale-safe as-is.
    """
    e = _events(spark, sf)
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-8, Window.currentRow)
    )
    med = F.expr(
        "percentile(value, 0.5) OVER (PARTITION BY event_type ORDER BY ts, event_id "
        "ROWS BETWEEN 8 PRECEDING AND CURRENT ROW)"
    )
    avg = F.avg("value").over(w)
    out = e.select(
        "event_type",
        "event_id",
        round4(F.col("value")).alias("v"),
        round4(med).alias("med9"),
        round4(avg).alias("avg9"),
    )
    return out


ORACLES["moving_median"] = f"""
    SELECT event_type, event_id, {R("value")} AS v,
           {R("quantile_cont(value, 0.5) OVER (PARTITION BY event_type ORDER BY ts, event_id ROWS BETWEEN 8 PRECEDING AND CURRENT ROW)")} AS med9,
           {R("AVG(value) OVER (PARTITION BY event_type ORDER BY ts, event_id ROWS BETWEEN 8 PRECEDING AND CURRENT ROW)")} AS avg9
    FROM events
"""
QUERIES["moving_median"] = q_moving_median


def q_user_paths(spark, sf):
    """Session path mining: the top-25 3-step event-type sequences across
    user sessions (30-min gap) — the product-analytics "common journeys"
    query. Sessions come from the same gap logic DQ24 pins; the path
    trigrams are a window over (session, time) — no per-session array
    materialization, so a million-event session costs the same per row
    as a short one.
    """
    e = _events(spark, sf).select("user_id", "ts", "event_id", "event_type")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(wu))
    new_s = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    sess = e.withColumn(
        "session_id",
        F.sum(new_s).over(wu.rowsBetween(Window.unboundedPreceding, 0)),
    )
    ws = Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    path = F.concat_ws(
        ">",
        F.col("event_type"),
        F.lead("event_type", 1).over(ws),
        F.lead("event_type", 2).over(ws),
    )
    trigrams = sess.select(
        path.alias("path"),
        F.lead("event_type", 2).over(ws).alias("_has3"),
    ).where(F.col("_has3").isNotNull())
    wr = Window.partitionBy().orderBy(
        F.desc("n"), F.md5(F.encode(F.col("path"), "UTF-8")).asc()
    )
    return (
        trigrams.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("rk", F.row_number().over(wr))
        .where(F.col("rk") <= 25)
        .select(F.col("rk").cast("int").alias("rk"), "path", "n")
    )


ORACLES["user_paths"] = """
    WITH g AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN floor(epoch(ts)) - floor(epoch(LAG(ts) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id))) > 1800
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_s
      FROM events
    ), s AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS session_id
      FROM g
    ), t AS (
      SELECT event_type || '>' ||
             LEAD(event_type, 1) OVER w || '>' ||
             LEAD(event_type, 2) OVER w AS path,
             LEAD(event_type, 2) OVER w AS has3
      FROM s
      WINDOW w AS (PARTITION BY user_id, session_id ORDER BY ts, event_id)
    )
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, md5(path) ASC) AS INTEGER) AS rk,
           path, COUNT(*) AS n
    FROM t WHERE has3 IS NOT NULL
    GROUP BY path
    ORDER BY n DESC, md5(path) ASC
    LIMIT 25
"""
QUERIES["user_paths"] = q_user_paths


def q_pagerank(spark, sf):
    """PageRank centrality (operators/pagerank.py) over the customer↔
    supplier transaction graph (symmetric edges from who-bought-from-whom
    via lineitem ⋈ orders) — the link-centrality quality prior web-corpus
    curation applies to domains, exercised on the fixture's entity graph.
    5 damped power-iteration rounds; the oracle unrolls the identical
    iteration as chained CTEs, so every round's join+aggregate semantics
    are hash-pinned (ranks rounded to absorb sub-ulp fold differences).
    """
    from batch_processing_pipeline_spark.operators.pagerank import pagerank

    l = _t(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    o = _t(spark, sf, "orders").select("o_orderkey", "o_custkey")
    cs = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(
            (F.col("o_custkey") + F.lit(1_000_000)).alias("c"),
            F.col("l_suppkey").alias("s"),
        )
        .distinct()
    )
    edges = cs.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionByName(
        cs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    ranks = pagerank(edges, iterations=5)
    return ranks.select("node", round4(F.col("rank") * 1000.0).alias("rank_k"))


def _pagerank_oracle(iterations: int = 5, damping: float = 0.85) -> str:
    head = """
    WITH cs AS (
      SELECT DISTINCT o.o_custkey + 1000000 AS c, l.l_suppkey AS s
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ), edges AS (
      SELECT c AS src, s AS dst FROM cs
      UNION ALL
      SELECT s AS src, c AS dst FROM cs
    ), deg AS (
      SELECT src, COUNT(*) AS out_deg FROM edges GROUP BY src
    ), nodes AS (
      SELECT DISTINCT src AS node FROM edges
      UNION SELECT DISTINCT dst FROM edges
    ), nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
    r0 AS (
      SELECT node, CAST(1.0 AS DOUBLE) / nn.n AS rank FROM nodes, nn
    )"""
    steps = []
    for i in range(1, iterations + 1):
        steps.append(f""",
    r{i} AS (
      SELECT nodes.node,
             (CAST(1.0 AS DOUBLE) - CAST({damping} AS DOUBLE)) / nn.n
             + CAST({damping} AS DOUBLE) * COALESCE(contrib.in_sum, CAST(0.0 AS DOUBLE)) AS rank
      FROM nodes CROSS JOIN nn
      LEFT JOIN (
        SELECT e.dst, SUM(r.rank / d.out_deg) AS in_sum
        FROM edges e
        JOIN r{i - 1} r ON e.src = r.node
        JOIN deg d ON e.src = d.src
        GROUP BY e.dst
      ) contrib ON contrib.dst = nodes.node
    )""")
    from batch_processing_pipeline_spark.functions.rounding import sql_round4

    tail = f"""
    SELECT node, {sql_round4(f"rank * CAST(1000.0 AS DOUBLE)")} AS rank_k
    FROM r{iterations}
    """
    return head + "".join(steps) + tail


ORACLES["pagerank"] = _pagerank_oracle()
QUERIES["pagerank"] = q_pagerank


def q_curation_rules(spark, sf):
    """Gopher/C4-style heuristic rule panel per document: named boolean
    rules + the conjunctive keep flag, the interpretable complement to
    the learned quality model (quality_lr_scores). All rules are plain
    column expressions (one tokenize pass feeds three of them), so the
    panel runs at scan speed and pushes nothing to Python.
    """
    d = _t(spark, sf, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    n_words = F.size(toks)
    mean_wl = F.aggregate(
        toks, F.lit(0), lambda acc, w: acc + F.length(w)
    ).cast("double") / n_words.cast("double")
    has_stop = F.arrays_overlap(toks, F.array(F.lit("the"), F.lit("a"), F.lit("of")))
    rules = d.select(
        "doc_id",
        n_words.alias("n_words"),
        round4(mean_wl).alias("mean_word_len"),
        (n_words >= 20).alias("r_min_words"),
        (n_words <= 10000).alias("r_max_words"),
        ((mean_wl >= 3.0) & (mean_wl <= 10.0)).alias("r_word_len"),
        has_stop.alias("r_stopword"),
    )
    return rules.withColumn(
        "keep",
        F.col("r_min_words") & F.col("r_max_words") & F.col("r_word_len")
        & F.col("r_stopword"),
    )


ORACLES["curation_rules"] = f"""
    WITH t AS (
      SELECT doc_id,
             regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
      FROM documents
    ), m AS (
      SELECT doc_id,
             CAST(len(toks) AS INTEGER) AS n_words,
             CAST(list_sum(list_transform(toks, w -> length(w))) AS DOUBLE)
               / CAST(len(toks) AS DOUBLE) AS mwl,
             len(list_intersect(toks, ['the', 'a', 'of'])) > 0 AS has_stop
      FROM t
    )
    SELECT doc_id, n_words, {R("mwl")} AS mean_word_len,
           n_words >= 20 AS r_min_words,
           n_words <= 10000 AS r_max_words,
           (mwl >= CAST(3.0 AS DOUBLE) AND mwl <= CAST(10.0 AS DOUBLE)) AS r_word_len,
           has_stop AS r_stopword,
           (n_words >= 20 AND n_words <= 10000
            AND mwl >= CAST(3.0 AS DOUBLE) AND mwl <= CAST(10.0 AS DOUBLE)
            AND has_stop) AS keep
    FROM m
"""
QUERIES["curation_rules"] = q_curation_rules


def q_boilerplate_ngrams(spark, sf):
    """Corpus-frequency boilerplate detection: the fraction of each
    document's word-5-grams that occur in ≥ 3 distinct documents —
    the RefinedWeb-style boilerplate signal (navigation chrome, license
    headers), complementary to cross-set ``decontaminate`` and
    within-doc ``text_repetition``.

    Scale shape: 5-grams travel as xxhash64 digests (8 B), never as
    strings; the per-gram document frequency is one partial-agg pass and
    the common-gram relation (small by construction: high-df grams are
    few; the threshold tracks corpus size — web corpora use ≥20, the
    fixture's 500-doc corpus uses ≥3) broadcasts back into a map-side membership join.
    """
    d = _t(spark, sf, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    # guard sub-5-token documents BEFORE building the position sequence:
    # sequence(0, size-5) with size<5 descends into negative positions and
    # slice() rejects start 0 at runtime. Short docs simply have no
    # 5-grams (they are absent here AND in the oracle's empty range()).
    grams = (
        d.where(F.size(toks) >= 5)
        .select("doc_id", F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - F.lit(5)),
                lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i + 1, F.lit(5)))),
            )
        ).alias("g"))
    )
    df_counts = grams.groupBy("g").agg(
        F.countDistinct("doc_id").alias("df")
    )
    common = df_counts.where(F.col("df") >= 3).select("g")
    per_doc = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    boiler = (
        grams.join(F.broadcast(common), "g", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_boiler"))
    )
    return (
        per_doc.join(boiler, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce(F.col("n_boiler"), F.lit(0)).alias("n_boiler"),
            round4(
                F.coalesce(F.col("n_boiler"), F.lit(0)).cast("double")
                / F.col("n_grams").cast("double")
            ).alias("boiler_frac"),
        )
    )


ORACLES["boilerplate_ngrams"] = f"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
      FROM documents
    ), g AS (
      SELECT doc_id,
             array_to_string(toks[i + 1 : i + 5], ' ') AS gram
      FROM t, UNNEST(range(0, len(toks) - 4)) AS u(i)
    ), dfreq AS (
      SELECT gram, COUNT(DISTINCT doc_id) AS df FROM g GROUP BY gram
    ), per_doc AS (
      SELECT doc_id, COUNT(*) AS n_grams FROM g GROUP BY doc_id
    ), boiler AS (
      SELECT g.doc_id, COUNT(*) AS n_boiler
      FROM g JOIN dfreq USING (gram)
      WHERE dfreq.df >= 3
      GROUP BY g.doc_id
    )
    SELECT p.doc_id, CAST(p.n_grams AS BIGINT) AS n_grams,
           CAST(COALESCE(b.n_boiler, 0) AS BIGINT) AS n_boiler,
           {R("CAST(COALESCE(b.n_boiler, 0) AS DOUBLE) / CAST(p.n_grams AS DOUBLE)")}
               AS boiler_frac
    FROM per_doc p LEFT JOIN boiler b ON p.doc_id = b.doc_id
"""
QUERIES["boilerplate_ngrams"] = q_boilerplate_ngrams


def q_seasonal_outliers(spark, sf):
    """Seasonality-aware anomaly flags: each event scores against the
    mean/std of ITS OWN (event_type, hour-of-day) cell, so a value normal
    at peak hours but anomalous at 3am flags correctly — the refinement
    global z-scores (``outliers``) structurally miss.

    Scale shape: the per-cell baseline is a tiny aggregate (types × 24
    rows) broadcast back; scoring is map-side. Population std (stddev_pop)
    on both engines; rounded-z threshold keeps the float contract
    portable.
    """
    e = _events(spark, sf).select(
        "event_id", "event_type", "value", F.hour("ts").alias("hod")
    )
    base = e.groupBy("event_type", "hod").agg(
        F.avg("value").alias("mu"),
        F.stddev_pop("value").alias("sd"),
        F.count(F.lit(1)).alias("n"),
    )
    z = round4((F.col("value") - F.col("mu")) / F.col("sd"))
    return (
        e.join(F.broadcast(base), ["event_type", "hod"])
        .where((F.col("sd") > 0) & (F.col("n") >= 30))
        .select("event_id", "event_type", "hod", z.alias("z"))
        .where(F.abs(F.col("z")) > F.lit(3.0))
    )


ORACLES["seasonal_outliers"] = f"""
    WITH e AS (
      SELECT event_id, event_type, value,
             CAST(EXTRACT(HOUR FROM ts) AS INTEGER) AS hod
      FROM events
    ), base AS (
      SELECT event_type, hod, AVG(value) AS mu, stddev_pop(value) AS sd,
             COUNT(*) AS n
      FROM e GROUP BY event_type, hod
    )
    SELECT e.event_id, e.event_type, e.hod,
           {R("(e.value - b.mu) / b.sd")} AS z
    FROM e JOIN base b ON e.event_type = b.event_type AND e.hod = b.hod
    WHERE b.sd > 0 AND b.n >= 30
      AND abs({R("(e.value - b.mu) / b.sd")}) > CAST(3.0 AS DOUBLE)
"""
QUERIES["seasonal_outliers"] = q_seasonal_outliers


def q_weighted_median(spark, sf):
    """Weighted median: the quantity-weighted median unit price per
    return flag — the weighted-quantile primitive (percentile() has no
    weight argument) that temperature sampling and budget-balanced
    domain mixing are built on.

    One window pass: cumulative weight in deterministic (price, row-key)
    order, then the first row whose cumulative weight crosses half the
    total. The fold order is identical in both engines, so the doubles
    (and the crossing row) match exactly.
    """
    l = _t(spark, sf, "lineitem")
    order = [F.col("l_extendedprice").asc(), F.col("l_orderkey").asc(),
             F.col("l_linenumber").asc()]
    w = Window.partitionBy("l_returnflag").orderBy(*order)
    cumw = F.sum("l_quantity").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    total = F.sum("l_quantity").over(Window.partitionBy("l_returnflag"))
    rows = l.select(
        "l_returnflag",
        "l_extendedprice",
        cumw.alias("cw"),
        total.alias("tw"),
    )
    return rows.groupBy("l_returnflag").agg(
        round4(
            F.min(
                F.when(
                    F.col("cw") >= F.col("tw") * F.lit(0.5),
                    F.col("l_extendedprice"),
                )
            )
        ).alias("wmedian_price"),
        round4(F.max("tw")).alias("total_weight"),
    )


ORACLES["weighted_median"] = f"""
    WITH t AS (
      SELECT l_returnflag, l_extendedprice,
             SUM(l_quantity) OVER (PARTITION BY l_returnflag
                                   ORDER BY l_extendedprice, l_orderkey, l_linenumber
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
             SUM(l_quantity) OVER (PARTITION BY l_returnflag) AS tw
      FROM lineitem
    )
    SELECT l_returnflag,
           {R("MIN(CASE WHEN cw >= tw * CAST(0.5 AS DOUBLE) THEN l_extendedprice END)")}
               AS wmedian_price,
           {R("MAX(tw)")} AS total_weight
    FROM t
    GROUP BY l_returnflag
"""
QUERIES["weighted_median"] = q_weighted_median


def q_temperature_mix(spark, sf):
    """Temperature-based language rebalancing (p_lang ∝ count^0.5, the
    multinomial-temperature data recipe): the majority language
    downsamples toward the tail languages' rate with no hand-written
    targets (operators/sampling.py temperature_mix). α=0.5 rides sqrt —
    correctly rounded in IEEE 754 — so the kept SET matches the oracle
    row-for-row, not just approximately.
    """
    from batch_processing_pipeline_spark.operators.sampling import temperature_mix

    d = _t(spark, sf, "documents").select("doc_id", "lang")
    return temperature_mix(d, alpha=0.5, domain_col="lang")


ORACLES["temperature_mix"] = """
    WITH cnt AS (SELECT lang, COUNT(*) AS c FROM documents GROUP BY lang),
    w AS (SELECT lang, c, sqrt(CAST(c AS DOUBLE)) AS pw FROM cnt),
    -- sw = the LAST value of a lang-ordered running sum: sequential
    -- additions in sorted-domain order, the same pinned fold the engine
    -- computes driver-side (an unordered SUM() could differ by an ulp
    -- and flip a floor() boundary)
    o AS (SELECT lang, c, pw,
                 SUM(pw) OVER (ORDER BY lang
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM w),
    n AS (SELECT cum AS sw FROM o ORDER BY lang DESC LIMIT 1),
    j AS (SELECT o.lang, o.c, o.pw / n.sw AS p FROM o CROSS JOIN n),
    s AS (SELECT MIN(c / p) AS nstar FROM j),
    fr AS (SELECT j.lang,
                  printf('%08x', LEAST(CAST(FLOOR(j.p * s.nstar / j.c * 4294967296.0) AS BIGINT),
                                       4294967295)) AS thr
           FROM j CROSS JOIN s)
    SELECT d.doc_id, d.lang
    FROM documents d JOIN fr ON d.lang = fr.lang
    WHERE substr(md5('temp:' || CAST(d.doc_id AS VARCHAR)), 1, 8) < fr.thr
"""
QUERIES["temperature_mix"] = q_temperature_mix


def q_tokenizer_fertility(spark, sf):
    """Tokenizer fertility per language: BPE-ish tokens per whitespace
    word — the standard metric for how well a tokenizer serves each
    language (high fertility = more compute per word; drives vocab and
    mixture decisions). One scan, two token counters, per-lang ratio.
    """
    from batch_processing_pipeline_spark.functions.text_analysis import (
        bpe_ish_token_count,
        whitespace_token_count,
    )

    d = _t(spark, sf, "documents")
    t = F.col("text")
    # blank-text guard on BOTH sides: the engines disagree on tokenizing
    # '' ('' splits to [] here but [''] in DuckDB), so blank docs are
    # excluded from the ratio rather than papered over
    return (
        d.where(F.length(F.trim(t)) > 0)
        .select("lang", whitespace_token_count(t).alias("ws"),
                bpe_ish_token_count(t).alias("bpe"))
        .groupBy("lang")
        .agg(
            F.sum("ws").alias("ws_tokens"),
            F.sum("bpe").alias("bpe_tokens"),
            round4(F.sum("bpe").cast("double") / F.sum("ws").cast("double")).alias(
                "fertility"
            ),
        )
    )


ORACLES["tokenizer_fertility"] = f"""
    WITH t AS (
      SELECT lang,
             CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS BIGINT) AS ws,
             CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS BIGINT) AS bpe
      FROM documents
      WHERE length(trim(text)) > 0
    )
    SELECT lang, CAST(SUM(ws) AS BIGINT) AS ws_tokens,
           CAST(SUM(bpe) AS BIGINT) AS bpe_tokens,
           {R("CAST(SUM(bpe) AS DOUBLE) / CAST(SUM(ws) AS DOUBLE)")} AS fertility
    FROM t GROUP BY lang
"""
QUERIES["tokenizer_fertility"] = q_tokenizer_fertility


def q_compression_ratio(spark, sf):
    """Compression-ratio quality signal (Gopher-style): zlib-compressed
    bytes / raw bytes per document. Repetitive or templated text
    compresses far below natural prose, so a low ratio flags boilerplate
    the n-gram heuristics miss. zlib level is pinned (6) so the ratio is
    deterministic; Arrow-batched pandas UDF (DEFLATE is not expressible
    in either SQL engine → rows-only; determinism + monotonicity pinned
    in pytest).
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def comp_ratio(texts: pd.Series) -> pd.Series:
        import zlib

        def run(s):
            if s is None or not s:
                return 1.0
            raw = s.encode("utf-8")
            return round(len(zlib.compress(raw, 6)) / len(raw), 4)

        return texts.map(run)

    d = _t(spark, sf, "documents")
    return d.select("doc_id", comp_ratio(F.col("text")).alias("comp_ratio"))


ORACLES["compression_ratio"] = None
QUERIES["compression_ratio"] = q_compression_ratio


def q_containment_pairs(spark, sf):
    """Directed shingle-containment pairs (operators/dedup.py
    containment_pairs): the subset-duplication detector — a short
    document living inside a longer one scores ~1.0 containment while
    its symmetric Jaccard stays low. Bounded scope (the oracle ground
    truth; scale path = the same statistic over MinHash candidates).
    """
    from batch_processing_pipeline_spark.operators.dedup import containment_pairs

    d = _t(spark, sf, "documents").where(F.col("doc_id") < 60)
    return containment_pairs(d, shingle_n=3, threshold=0.62)


ORACLES["containment_pairs"] = f"""
    WITH sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, length(lower(trim(text))) - 1),
                                          i -> substring(lower(trim(text)), i, 3))) AS sh
      FROM documents
      WHERE doc_id < 60 AND length(lower(trim(text))) >= 3
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           {R("CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / CAST(len(a.sh) AS DOUBLE)")}
               AS containment
    FROM sh a JOIN sh b ON a.doc_id <> b.doc_id
    WHERE {R("CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / CAST(len(a.sh) AS DOUBLE)")}
            >= CAST(0.62 AS DOUBLE)
"""
QUERIES["containment_pairs"] = q_containment_pairs


def q_benford_audit(spark, sf):
    """Benford first-digit audit of order totals: observed leading-digit
    distribution vs the Benford expectation with a chi-square statistic —
    the classic synthetic-/manipulated-data smell test an ingest gate
    runs on financial-ish columns.

    The leading digit extracts through string form (substr of the
    floored value) — exact in both engines, where ``floor(log10(x))``
    can flip at decade boundaries from libm ulp differences. Benford
    expectations ship as shared literals, so the chi-square contribution
    folds identically.
    """
    o = _t(spark, sf, "orders").where(F.col("o_totalprice") >= 1.0)
    digit = F.substring(
        F.floor(F.col("o_totalprice")).cast("long").cast("string"), 1, 1
    ).cast("int")
    counts = o.groupBy(digit.alias("d")).agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("tot"))
    benford = spark.createDataFrame(
        [(d, __import__("math").log10(1 + 1 / d)) for d in range(1, 10)],
        "d int, p double",
    )
    return (
        counts.join(F.broadcast(benford), "d")
        .crossJoin(F.broadcast(total))
        .select(
            "d",
            "n",
            round4(F.col("n") / F.col("tot")).alias("obs_p"),
            round4(F.col("p")).alias("benford_p"),
            round4(
                F.pow(F.col("n") - F.col("p") * F.col("tot"), F.lit(2.0))
                / (F.col("p") * F.col("tot"))
            ).alias("chi2_term"),
        )
    )


# Benford expectations inlined as the exact literals Python's repr emits,
# so both engines parse identical doubles.
_BENFORD = ", ".join(
    f"({d}, {__import__('math').log10(1 + 1 / d)!r})" for d in range(1, 10)
)
ORACLES["benford_audit"] = f"""
    WITH c AS (
      SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS d,
             COUNT(*) AS n
      FROM orders WHERE o_totalprice >= CAST(1.0 AS DOUBLE)
      GROUP BY 1
    ), t AS (SELECT SUM(n) AS tot FROM c),
    b(d, p) AS (VALUES {_BENFORD})
    SELECT c.d, c.n,
           {R("CAST(c.n AS DOUBLE) / t.tot")} AS obs_p,
           {R("b.p")} AS benford_p,
           {R("POWER(c.n - b.p * t.tot, CAST(2.0 AS DOUBLE)) / (b.p * t.tot)")} AS chi2_term
    FROM c JOIN b ON c.d = b.d CROSS JOIN t
"""
QUERIES["benford_audit"] = q_benford_audit


def q_tfidf_cosine_pairs(spark, sf):
    """Sparse lexical similarity: TF-IDF cosine ≥ 0.5 between document
    pairs — the third similarity modality alongside dense-embedding
    cosine (sim_topk) and shingle Jaccard (dedup_*), and the one that
    rides an inverted-index shape: pairs form ONLY through shared terms
    (an equi-join on the term string), so sparsity does the candidate
    pruning that LSH does for the other modalities.

    Scale shape: the dot product is a term-keyed join of (doc, term,
    weight) rows + partial-agg sum per pair — at corpus scale the join
    key's df-skew is bounded by dropping ubiquitous terms (df > 50% of
    docs here), the sparse analog of a stopword list. Bounded scope for
    the exact oracle.
    """
    from batch_processing_pipeline_spark.functions.tfidf import tfidf

    d = _t(spark, sf, "documents").where(F.col("doc_id") < 80)
    w = tfidf(d).select("doc_id", "word", F.col("tfidf").alias("w"))
    n_docs = d.count()  # bounded scope; used for the df prune only
    docfreq = w.groupBy("word").agg(F.countDistinct("doc_id").alias("dfd"))
    w = w.join(
        F.broadcast(docfreq.where(F.col("dfd") <= n_docs * 0.5)), "word"
    ).select("doc_id", "word", "w")
    norms = w.groupBy("doc_id").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
    a = w.alias("a")
    b = w.alias("b")
    dots = (
        a.join(b, (F.col("a.word") == F.col("b.word"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.sum(F.col("a.w") * F.col("b.w")).alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("id_a"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("doc_id").alias("id_b"), F.col("nrm").alias("nb"))
    return (
        dots.join(na, "id_a").join(nb, "id_b")
        .select(
            "id_a", "id_b",
            round4(F.col("dot") / (F.col("na") * F.col("nb"))).alias("cosine"),
        )
        .where(F.col("cosine") >= 0.5)
    )


ORACLES["tfidf_cosine_pairs"] = f"""
    WITH tok AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS word
      FROM documents WHERE doc_id < 80 AND length(lower(trim(text))) > 0
    ), tf AS (
      SELECT doc_id, word, COUNT(*) AS tf FROM tok GROUP BY doc_id, word
    ), dfreq AS (
      SELECT word, COUNT(DISTINCT doc_id) AS df_docs FROM tok GROUP BY word
    ), n AS (
      SELECT COUNT(DISTINCT doc_id) AS n_docs
      FROM documents WHERE doc_id < 80
    ), w AS (
      SELECT tf.doc_id, tf.word,
             tf.tf * (ln((1.0 + n.n_docs) / (1.0 + dfreq.df_docs)) + 1.0) AS w
      FROM tf JOIN dfreq USING (word) CROSS JOIN n
      WHERE dfreq.df_docs <= (SELECT n_docs FROM n) * 0.5
    ), norms AS (
      SELECT doc_id, sqrt(SUM(w * w)) AS nrm FROM w GROUP BY doc_id
    ), dots AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, SUM(a.w * b.w) AS dot
      FROM w a JOIN w b ON a.word = b.word AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT d.id_a, d.id_b,
           {R("d.dot / (na.nrm * nb.nrm)")} AS cosine
    FROM dots d
    JOIN norms na ON d.id_a = na.doc_id
    JOIN norms nb ON d.id_b = nb.doc_id
    WHERE {R("d.dot / (na.nrm * nb.nrm)")} >= CAST(0.5 AS DOUBLE)
"""
QUERIES["tfidf_cosine_pairs"] = q_tfidf_cosine_pairs


# bucketed-layout dirs to remove at interpreter exit (one registration
# per directory; names are per-application so nothing else reuses them)
_SMB_CLEANUP_DIRS: set = set()


def q_smb_join(spark, sf):
    """Sort-merge-bucket join: both sides written bucketed+sorted on the
    join key (operators/bucketed.py), so the per-query shuffle disappears —
    the one-time layout cost is amortized across every later batch, the
    trade the reference's 5-minute MySQL-rejoin cron
    (`README.md:31-41`) makes thousands of times over.  The no-Exchange /
    no-per-batch-Sort property is plan-asserted in tests/test_bucketed.py;
    here the oracle pins the join+aggregate semantics themselves.
    (reuse=True: within a session the layout is built once and every
    later call pays only the shuffle-free join — the amortization itself.
    The per-application layout directory is removed at interpreter exit —
    table names are per-application, so without cleanup every session
    would orphan a new /tmp tree.)
    """
    import atexit
    import hashlib
    import os
    import re
    import shutil

    from batch_processing_pipeline_spark.operators.bucketed import (
        bucketed_join,
        write_bucketed,
    )

    # Tag = sanitized Spark applicationId + hash of the ABSOLUTE sf dir:
    # unique per session (no cross-process /tmp races), and two different
    # datasets sharing a directory basename can never collide into one
    # reused table. Within a session the tag is stable, so reuse=True
    # still amortizes the layout across repeated calls.
    app = re.sub(r"[^A-Za-z0-9_]", "_", spark.sparkContext.applicationId)
    tag = f"{app}_{hashlib.md5(os.path.abspath(sf).encode()).hexdigest()[:8]}"
    base = f"/tmp/bpps_bucketed/{tag}"
    if base not in _SMB_CLEANUP_DIRS:
        _SMB_CLEANUP_DIRS.add(base)
        atexit.register(shutil.rmtree, base, ignore_errors=True)
    o = _t(spark, sf, "orders").select(
        F.col("o_orderkey").alias("okey"), "o_orderpriority"
    )
    l = _t(spark, sf, "lineitem").select(
        F.col("l_orderkey").alias("okey"), "l_extendedprice", "l_discount"
    )
    write_bucketed(o, f"smb_orders_{tag}", f"{base}/orders", ["okey"], 8,
                   sort_cols=["okey"], reuse=True)
    write_bucketed(l, f"smb_lineitem_{tag}", f"{base}/lineitem", ["okey"], 8,
                   sort_cols=["okey"], reuse=True)
    j = bucketed_join(spark, f"smb_orders_{tag}", f"smb_lineitem_{tag}", ["okey"])
    return j.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_items"),
        round4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
            "revenue"
        ),
    )


ORACLES["smb_join"] = f"""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_items,
           {R("SUM(l.l_extendedprice * (1 - l.l_discount))")} AS revenue
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
"""
QUERIES["smb_join"] = q_smb_join


def q_ewma_smooth(spark, sf):
    """Exponentially weighted moving average (alpha=0.3) of the daily mean
    event value per event_type — the classic monitoring smoother, expressed
    NON-recursively so it stays a single window pass: with s_1 = x_1 and
    s_t = a*x_t + (1-a)*s_{t-1}, the closed form is
    s_t = (1-a)^t * cumsum_i( g_i ), g_1 = x_1/(1-a), g_i = a*x_i*(1-a)^-i.
    One running SUM over a rows-frame (no self-join per lag, no recursion),
    which Spark evaluates as a single window operator after one shuffle on
    event_type — the 100-TB shape for per-entity smoothing.  Exponents are
    bounded by the per-key row count (30 days here); for unbounded keys,
    re-base the exponent per window chunk.
    """
    a = 0.3
    daily = (
        _events(spark, sf)
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.avg("value").alias("x"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    rn = F.row_number().over(w)
    g = F.when(rn == 1, F.col("x") / F.lit(1 - a)).otherwise(
        F.lit(a) * F.col("x") * F.pow(F.lit(1 - a), -rn)
    )
    cum = F.sum(g).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    # (1-a)^-rn exceeds double range near rn~1990 and the closed form
    # degrades to NaN SILENTLY (both engines agree on the NaNs, so the
    # oracle would not catch it) — fail loudly instead; past this bound
    # the right implementation is chunk-sequential (applyInPandas per
    # key), not a longer float
    guard = F.coalesce(
        F.assert_true(
            rn <= 1500, F.lit("ewma_smooth: per-key series exceeds the "
                              "closed-form exponent bound (1500 rows)")
        ).cast("double"),
        F.lit(0.0),
    )
    return daily.select(
        "event_type",
        "day",
        round4(F.col("x")).alias("x"),
        round4(F.pow(F.lit(1 - a), rn) * cum + guard).alias("ewma"),
    )


ORACLES["ewma_smooth"] = f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, AVG(value) AS x
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ), numbered AS (
      SELECT event_type, day, x,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS rn
      FROM daily
    ), summed AS (
      SELECT event_type, day, x, rn,
             SUM(CASE WHEN rn = 1 THEN x / 0.7
                      ELSE 0.3 * x * pow(0.7, -rn) END)
               OVER (PARTITION BY event_type ORDER BY rn
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM numbered
    )
    SELECT event_type, day, {R("x")} AS x,
           {R("pow(0.7, rn) * cum")} AS ewma
    FROM summed
"""
QUERIES["ewma_smooth"] = q_ewma_smooth


def q_cms_topk(spark, sf):
    """Count-min sketch heavy hitters: d=4 hash rows x 256 buckets (bucket =
    first 2 hex chars of a salted md5, identical in both engines), estimate
    = min over rows, top-20 words by estimate.  The sketch is built from the
    word-count relation (bucket counts = sums of member word counts —
    mathematically identical to per-occurrence hashing and the mergeable
    map-side shape: at 100 TB each partition emits a 4x256 partial sketch
    and only those 1,024-cell sketches shuffle, never the token stream).
    true_cnt rides along so the oracle pins the overestimate bias too.
    """
    d = 4
    tok = (
        _t(spark, sf, "documents")
        .where(F.length(F.lower(F.trim(F.col("text")))) > 0)
        .select(
            F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("word")
        )
        .where(F.col("word") != "")
    )
    words = tok.groupBy("word").agg(F.count("*").alias("true_cnt"))
    bucket = lambda i: F.substring(  # noqa: E731
        F.md5(F.concat(F.lit(f"c{i}:"), F.col("word"))), 1, 2
    )
    # melt to (word, true_cnt, r, b): ONE pass feeds both the sketch build
    # and the estimate probe — no per-row rebuild of the vocab relation
    wb = words.select(
        "word",
        "true_cnt",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("r"), bucket(i).alias("b"))
                    for i in range(d)
                ]
            )
        ).alias("h"),
    ).select("word", "true_cnt", "h.r", "h.b")
    sketch = wb.groupBy("r", "b").agg(F.sum("true_cnt").alias("cnt"))
    return (
        wb.join(F.broadcast(sketch), ["r", "b"])
        .groupBy("word")
        .agg(F.min("cnt").alias("est"), F.min("true_cnt").alias("true_cnt"))
        .orderBy(F.desc("est"), F.md5(F.encode(F.col("word"), "UTF-8")))
        .limit(20)
    )


ORACLES["cms_topk"] = """
    WITH tok AS (
      SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS word
      FROM documents WHERE length(lower(trim(text))) > 0
    ), words AS (
      SELECT word, COUNT(*) AS true_cnt FROM tok WHERE word <> ''
      GROUP BY word
    ), wb AS (
      SELECT word, true_cnt, r,
             substr(md5('c' || r || ':' || word), 1, 2) AS b
      FROM words CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS r)
    ), sketch AS (
      SELECT r, b, SUM(true_cnt) AS cnt FROM wb GROUP BY r, b
    ), est AS (
      SELECT w.word, MIN(w.true_cnt) AS true_cnt, MIN(s.cnt) AS est
      FROM wb w JOIN sketch s ON w.r = s.r AND w.b = s.b
      GROUP BY w.word
    )
    SELECT word, CAST(est AS BIGINT) AS est, CAST(true_cnt AS BIGINT) AS true_cnt
    FROM est ORDER BY est DESC, md5(word) LIMIT 20
"""
QUERIES["cms_topk"] = q_cms_topk


def q_triangle_count(spark, sf):
    """Per-node triangle participation on the supplier co-shipment k-NN
    graph: each supplier keeps its top-5 strongest co-occurrence partners
    (ties broken by partner id), an edge survives if EITHER endpoint kept
    it.  k-NN sparsification bounds edges at k*n regardless of how dense
    raw co-occurrence gets (the fixture's is near-complete), so the wedge
    join below stays linear in n at every SF.  Triangles enumerated on the
    ORIENTED edge list (s1 < s2), the standard distributed scheme: each
    triangle produced exactly once by two equi-joins, no post-hoc dedup —
    at web scale, orient by (degree, id) instead of id to cap wedge
    fan-out on hubs.
    """
    li = _t(spark, sf, "lineitem").select("l_orderkey", "l_suppkey").distinct()
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
        )
        .groupBy(
            F.col("a.l_suppkey").alias("s1"), F.col("b.l_suppkey").alias("s2")
        )
        .agg(F.count("*").alias("c"))
    )
    nbrs = pairs.unionByName(
        pairs.select(
            F.col("s2").alias("s1"), F.col("s1").alias("s2"), "c"
        )
    )
    w = Window.partitionBy("s1").orderBy(F.desc("c"), "s2")
    kept = nbrs.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 5)
    edges = (
        kept.select(
            F.least("s1", "s2").alias("s1"), F.greatest("s1", "s2").alias("s2")
        )
        .distinct()
    )
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.s2") == F.col("e2.s1"))
        .join(
            e3,
            (F.col("e3.s1") == F.col("e1.s1")) & (F.col("e3.s2") == F.col("e2.s2")),
        )
        .select(
            F.col("e1.s1").alias("x"),
            F.col("e1.s2").alias("y"),
            F.col("e2.s2").alias("z"),
        )
    )
    return (
        tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("tri_cnt"))
    )


ORACLES["triangle_count"] = """
    WITH li AS (
      SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
    ), pairs AS (
      SELECT a.l_suppkey AS s1, b.l_suppkey AS s2, COUNT(*) AS c
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
      GROUP BY a.l_suppkey, b.l_suppkey
    ), nbrs AS (
      SELECT s1, s2, c FROM pairs
      UNION ALL
      SELECT s2 AS s1, s1 AS s2, c FROM pairs
    ), kept AS (
      SELECT s1, s2,
             ROW_NUMBER() OVER (PARTITION BY s1 ORDER BY c DESC, s2) AS rn
      FROM nbrs
    ), edges AS (
      SELECT DISTINCT LEAST(s1, s2) AS s1, GREATEST(s1, s2) AS s2
      FROM kept WHERE rn <= 5
    ), tri AS (
      SELECT e1.s1 AS x, e1.s2 AS y, e2.s2 AS z
      FROM edges e1
      JOIN edges e2 ON e1.s2 = e2.s1
      JOIN edges e3 ON e3.s1 = e1.s1 AND e3.s2 = e2.s2
    ), nodes AS (
      SELECT x AS node FROM tri
      UNION ALL SELECT y FROM tri
      UNION ALL SELECT z FROM tri
    )
    SELECT node, COUNT(*) AS tri_cnt FROM nodes GROUP BY node
"""
QUERIES["triangle_count"] = q_triangle_count


def q_global_shuffle(spark, sf):
    """Deterministic global shuffle for training-data ordering: every doc
    gets a salted-md5 draw, the draw's first two hex chars pick one of 256
    shards (shard count bounds the rank stage's parallelism — size it to
    the cluster, hundreds to thousands at 100 TB),
    and position-within-shard is the rank of the remaining hex digits.
    Seeded, reproducible (no RNG state), and the 100-TB shape is exactly one
    hash shuffle + a per-shard local sort — there is never a global ORDER BY
    over the corpus; shard files are written independently and the training
    loader interleaves shards.
    """
    hexpos = lambda c: F.expr(  # noqa: E731
        f"instr('0123456789abcdef', {c})"
    ) - 1
    d = (
        _t(spark, sf, "documents")
        .withColumn(
            "_h", F.md5(F.concat(F.lit("gs:"), F.col("doc_id").cast("string")))
        )
        .select(
            "doc_id",
            # 256 shards from the first two hex chars — parallelism scales
            # with shard count, and every derived column reads the ONE
            # projected digest so salt logic can't drift between copies
            (
                hexpos("substring(_h, 1, 1)") * 16 + hexpos("substring(_h, 2, 1)")
            ).alias("shard"),
            F.substring("_h", 3, 8).alias("subkey"),
        )
    )
    w = Window.partitionBy("shard").orderBy("subkey", "doc_id")
    return d.select(
        "doc_id", "shard", F.row_number().over(w).cast("bigint").alias("pos")
    )


ORACLES["global_shuffle"] = """
    WITH h AS (
      SELECT doc_id, md5('gs:' || CAST(doc_id AS VARCHAR)) AS hh
      FROM documents
    ), d AS (
      SELECT doc_id,
             (strpos('0123456789abcdef', substr(hh, 1, 1)) - 1) * 16
             + (strpos('0123456789abcdef', substr(hh, 2, 1)) - 1) AS shard,
             substr(hh, 3, 8) AS subkey
      FROM h
    )
    SELECT doc_id, shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY subkey, doc_id)
                AS BIGINT) AS pos
    FROM d
"""
QUERIES["global_shuffle"] = q_global_shuffle


def q_ppjoin_pairs(spark, sf):
    """Exact near-dup pairs via prefix-filtered set-similarity join
    (operators/setsim.py, AllPairs/PPJoin family) — the only EXACT scale
    path among the dedup modalities: identical output to the O(n^2)
    all-pairs join (that's the oracle), but candidates come from an
    equi-join on rarest-first prefix tokens only.  The fixture corpus is
    template-generated (word-set similarity runs high and its tiny vocab
    blunts rarity-based pruning — natural Zipfian corpora prune far
    better), so the scope is a deterministic 1/16 md5 sample of the
    corpus+mutated union: scale-proportional, and the planted
    near-identical copies (id+10^7, one appended token) keep the
    threshold-0.9 band non-vacuous with the exact pair set hash-pinned.
    """
    from batch_processing_pipeline_spark.operators.setsim import ppjoin_pairs

    d = _t(spark, sf, "documents").select("doc_id", "text")
    mutated = d.select(
        (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zmutatedz")).alias("text"),
    )
    corpus = d.unionByName(mutated).where(
        F.substring(
            F.md5(F.concat(F.lit("pp:"), F.col("doc_id").cast("string"))), 1, 1
        )
        == "0"
    )
    return ppjoin_pairs(corpus, threshold=0.9).select(
        "id_a", "id_b", round4(F.col("jac")).alias("jac")
    )


ORACLES["ppjoin_pairs"] = f"""
    WITH all_docs AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 10000000, text || ' zmutatedz' FROM documents
    ), corpus AS (
      SELECT doc_id, text FROM all_docs
      WHERE substr(md5('pp:' || CAST(doc_id AS VARCHAR)), 1, 1) = '0'
    ), sets AS (
      SELECT doc_id AS id,
             list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+'))
               AS tokens
      FROM corpus WHERE length(lower(trim(text))) > 0
    ), sized AS (
      SELECT id, tokens, len(tokens) AS n FROM sets WHERE len(tokens) > 0
    )
    SELECT a.id AS id_a, b.id AS id_b,
           {R("CAST(len(list_intersect(a.tokens, b.tokens)) AS DOUBLE)"
              " / (a.n + b.n - len(list_intersect(a.tokens, b.tokens)))")}
             AS jac
    FROM sized a JOIN sized b ON a.id < b.id
    WHERE CAST(len(list_intersect(a.tokens, b.tokens)) AS DOUBLE)
          / (a.n + b.n - len(list_intersect(a.tokens, b.tokens)))
          >= CAST(0.9 AS DOUBLE)
"""
QUERIES["ppjoin_pairs"] = q_ppjoin_pairs


def q_dsir_weights(spark, sf):
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document by
    how much more likely its hashed-unigram features are under a TARGET
    distribution (here: the corpus's 'en' slice, standing in for a
    high-quality reference corpus) than under the RAW distribution —
    weight(d) = sum over token occurrences of log p_target(bucket) -
    log p_raw(bucket), buckets = first 2 hex chars of salted md5 (256
    cells), add-one smoothed.  The 100-TB shape: both distributions are
    256-row broadcast relations built by one map-side-combining groupBy;
    scoring is a broadcast join + partial-agg sum, so only 256-cell tables
    and per-doc partial sums ever shuffle — the reason hashed n-grams (not
    raw vocab) are the published method's choice.
    """
    docs = _t(spark, sf, "documents").where(
        F.length(F.lower(F.trim(F.col("text")))) > 0
    )
    tok = docs.select(
        "doc_id",
        "lang",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("word"),
    ).withColumn(
        "b", F.substring(F.md5(F.concat(F.lit("ds:"), F.col("word"))), 1, 2)
    )
    # ONE combined agg pass produces both distributions (raw and target
    # counts per bucket); totals come from the collected 256-row result —
    # separate tok.count() jobs would re-tokenize the full corpus twice
    # more for numbers this relation already holds
    counts = (
        tok.groupBy("b")
        .agg(
            F.count("*").alias("raw_n"),
            F.count(F.when(F.col("lang") == "en", 1)).alias("tgt_n"),
        )
        .collect()
    )
    raw_tot = sum(r["raw_n"] for r in counts)
    tgt_tot = sum(r["tgt_n"] for r in counts)
    dist = spark.createDataFrame(
        [(r["b"], r["raw_n"], r["tgt_n"]) for r in counts],
        "b string, raw_n long, tgt_n long",
    ).select(
        "b",
        (
            F.log((F.col("tgt_n") + 1) / F.lit(float(tgt_tot + 256)))
            - F.log((F.col("raw_n") + 1) / F.lit(float(raw_tot + 256)))
        ).alias("logratio"),
    )
    return (
        tok.join(F.broadcast(dist), "b")
        .groupBy("doc_id")
        .agg(round4(F.sum("logratio")).alias("weight"))
    )


ORACLES["dsir_weights"] = f"""
    WITH tok AS (
      SELECT doc_id, lang,
             unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS word
      FROM documents WHERE length(lower(trim(text))) > 0
    ), hashed AS (
      SELECT doc_id, lang, substr(md5('ds:' || word), 1, 2) AS b FROM tok
    ), raw AS (
      SELECT b, COUNT(*) AS raw_n FROM hashed GROUP BY b
    ), tgt AS (
      SELECT b, COUNT(*) AS tgt_n FROM hashed WHERE lang = 'en' GROUP BY b
    ), tots AS (
      SELECT (SELECT COUNT(*) FROM hashed) AS raw_tot,
             (SELECT COUNT(*) FROM hashed WHERE lang = 'en') AS tgt_tot
    ), dist AS (
      SELECT raw.b,
             ln((COALESCE(tgt.tgt_n, 0) + 1)
                / CAST(tots.tgt_tot + 256 AS DOUBLE))
             - ln((raw.raw_n + 1) / CAST(tots.raw_tot + 256 AS DOUBLE))
               AS logratio
      FROM raw LEFT JOIN tgt ON raw.b = tgt.b CROSS JOIN tots
    )
    SELECT h.doc_id, {R("SUM(d.logratio)")} AS weight
    FROM hashed h JOIN dist d ON h.b = d.b
    GROUP BY h.doc_id
"""
QUERIES["dsir_weights"] = q_dsir_weights


def q_sim_topk_pq(spark, sf):
    """Product-quantization ADC cosine top-10 with exact re-rank
    (operators/pq.py) — the fourth ANN path, attacking MEMORY: corpus
    vectors scan as m=16 nibble codes (16x smaller than float32; the
    fixture's vectors are isotropic-random — the hardest PQ case — so the
    finer m=16 split buys the recall budget), each query
    scores rows by m codebook-table lookups, then the top-50 ADC
    candidates re-rank by exact cosine.  Rows-only by design (k-means
    codebooks are seed-dependent); recall vs brute force is asserted in
    tests/test_round3_queries.py.
    """
    from batch_processing_pipeline_spark.operators.pq import (
        pq_topk,
        train_pq_codebooks,
    )

    emb = _t(spark, sf, "embeddings")
    books = train_pq_codebooks(emb, m=16, ksub=16, seed=42)
    return pq_topk(
        emb.where(F.col("vec_id") < 5), emb, books, k=10, refine=50
    ).select("query_id", "vec_id", "rank", round4(F.col("cosine")).alias("cosine"))


ORACLES["sim_topk_pq"] = None
QUERIES["sim_topk_pq"] = q_sim_topk_pq


def q_dup_spans(spark, sf):
    """Repeated-span detection (the substring-level dedup of Lee et al.
    2022, "Deduplicating Training Data Makes Language Models Better"):
    every 8-token window of every document is fingerprinted; spans whose
    fingerprint occurs more than once ACROSS the corpus are flagged with
    their in-document position — the removal list a span-dedup pass feeds
    a slicer.  Fourth granularity of dedup beside whole-doc (exact),
    near-doc (MinHash/SimHash/PPJoin), and cross-set (decontaminate).

    Scale shape: spans never leave their row as text — only the 16-byte
    fingerprint exits to the groupBy, with map-side partial counts; the
    flag join is fingerprint-keyed.  Span strings assemble from 7 LEAD()s
    over the per-doc position order — whole-stage codegen end to end (an
    array-slice transform was tried first: higher-order functions run
    interpreted, 5x slower on the span pass).
    """
    n = 8
    d = _t(spark, sf, "documents").where(
        F.length(F.lower(F.trim(F.col("text")))) > 0
    )
    tok = d.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias(
            "pos0", "word"
        ),
    )
    w = Window.partitionBy("doc_id").orderBy("pos0")
    parts = [F.col("word")] + [F.lead("word", i).over(w) for i in range(1, n)]
    spans = (
        tok.select(
            "doc_id",
            (F.col("pos0") + 1).alias("pos"),
            F.when(
                F.lead("word", n - 1).over(w).isNotNull(),
                F.md5(F.concat_ws(" ", *parts)),
            ).alias("fp"),
        )
        .where(F.col("fp").isNotNull())
    )
    dup_fps = (
        spans.groupBy("fp")
        .agg(F.count("*").alias("occurrences"))
        .where(F.col("occurrences") > 1)
    )
    return spans.join(dup_fps, "fp").select(
        "doc_id", "pos", "fp", "occurrences"
    )


ORACLES["dup_spans"] = """
    WITH toks AS (
      SELECT doc_id,
             regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
      FROM documents WHERE length(lower(trim(text))) > 0
    ), spans AS (
      SELECT doc_id, CAST(pos AS INTEGER) AS pos,
             md5(array_to_string(toks[pos:pos+7], ' ')) AS fp
      FROM toks, UNNEST(range(1, len(toks) - 6)) AS t(pos)
      WHERE len(toks) >= 8
    ), dup_fps AS (
      SELECT fp, COUNT(*) AS occurrences FROM spans GROUP BY fp
      HAVING COUNT(*) > 1
    )
    SELECT s.doc_id, s.pos, s.fp, d.occurrences
    FROM spans s JOIN dup_fps d USING (fp)
"""
QUERIES["dup_spans"] = q_dup_spans


def q_hard_negatives(spark, sf):
    """Contrastive-pair mining over the labeled embedding table: per anchor
    (vec_id < 5), the top-1 same-label neighbor ("positive") and the top-3
    nearest DIFFERENT-label neighbors ("hard negatives" — the pairs a
    contrastive/metric-learning loss learns most from).  One scored
    relation, two windowed top-k cuts; at corpus scale the scoring join is
    replaced by any of the engine's ANN paths (sign-LSH / IVF / PQ) — the
    mining logic downstream is identical.

    Cross-engine note: rank membership depends on unrounded cosine order,
    so near-ulp-tied candidates could rank differently between engines —
    the same inherent exposure as every top-k differential query here
    (sim_topk, dq13); the fixture's cosines are well-separated.
    """
    from batch_processing_pipeline_spark.functions.vector import (
        cosine_similarity,
    )

    emb = _t(spark, sf, "embeddings")
    q = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("embedding").alias("qvec"),
        F.col("label").alias("qlabel"),
    )
    c = emb.select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("cvec"),
        F.col("label").alias("clabel"),
    )
    scored = (
        q.crossJoin(c)
        .where(F.col("anchor_id") != F.col("cand_id"))
        .select(
            "anchor_id",
            "cand_id",
            F.when(F.col("qlabel") == F.col("clabel"), F.lit("pos"))
            .otherwise(F.lit("neg"))
            .alias("role"),
            cosine_similarity(F.col("qvec"), F.col("cvec")).alias("cos"),
        )
    )
    w = Window.partitionBy("anchor_id", "role").orderBy(
        F.desc("cos"), F.asc("cand_id")
    )
    ranked = scored.withColumn("rk", F.row_number().over(w))
    return ranked.where(
        ((F.col("role") == "pos") & (F.col("rk") == 1))
        | ((F.col("role") == "neg") & (F.col("rk") <= 3))
    ).select(
        "anchor_id", "role", "rk", "cand_id", round4(F.col("cos")).alias("cos")
    )


ORACLES["hard_negatives"] = f"""
    WITH scored AS (
      SELECT q.vec_id AS anchor_id, c.vec_id AS cand_id,
             CASE WHEN q.label = c.label THEN 'pos' ELSE 'neg' END AS role,
             list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                    CAST(c.embedding AS DOUBLE[])) AS cos
      FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < 5
    ), ranked AS (
      SELECT anchor_id, cand_id, role, cos,
             ROW_NUMBER() OVER (PARTITION BY anchor_id, role
                                ORDER BY cos DESC, cand_id ASC) AS rk
      FROM scored
    )
    SELECT anchor_id, role, rk, cand_id, {R("cos")} AS cos
    FROM ranked
    WHERE (role = 'pos' AND rk = 1) OR (role = 'neg' AND rk <= 3)
"""
QUERIES["hard_negatives"] = q_hard_negatives


def q_quantile_normalize(spark, sf):
    """Cross-domain quantile normalization of the heuristic quality score:
    a doc's within-language percentile rank is mapped to the GLOBAL score
    at that same percentile, making scores comparable across languages
    whose raw score distributions differ (the microarray-normalization
    trick, applied to curation thresholds so one global cutoff treats
    every domain fairly).  Deterministic tie-break (score, doc_id) on both
    the domain rank and the global reference ladder.

    Scale note: the global ladder here is an exact single-window
    row_number (fixture-sized); at corpus scale the ladder is an
    approx_percentile grid of a few hundred knots broadcast to the
    domain-ranked rows — same join shape, bounded reference.
    """
    from batch_processing_pipeline_spark.functions.text_analysis import (
        quality_score,
    )

    d = _t(spark, sf, "documents").where(
        F.length(F.lower(F.trim(F.col("text")))) > 0
    )
    scored = d.select("doc_id", "lang", quality_score(F.col("text")).alias("score"))
    wd = Window.partitionBy("lang").orderBy("score", "doc_id")
    ranked = scored.select(
        "doc_id",
        "lang",
        "score",
        (
            (F.row_number().over(wd) - 1).cast("double")
            / F.greatest(
                F.count("*").over(Window.partitionBy("lang")) - 1, F.lit(1)
            )
        ).alias("pr"),  # greatest(...,1): a single-doc language gets pr=0
        # instead of 0/0 -> NULL -> silently dropped from the join
    )
    wg = Window.orderBy("score", "doc_id")
    glob = scored.select(
        F.col("score").alias("gscore"), F.row_number().over(wg).alias("rn")
    )
    n = scored.count()
    target = ranked.withColumn(
        "target_rn", (F.floor(F.col("pr") * (n - 1)) + 1).cast("int")
    )
    return (
        target.join(F.broadcast(glob), F.col("target_rn") == F.col("rn"))
        .select(
            "doc_id",
            "lang",
            round4(F.col("score")).alias("score"),
            round4(F.col("pr")).alias("pr"),
            round4(F.col("gscore")).alias("qnorm_score"),
        )
    )


ORACLES["quantile_normalize"] = f"""
    WITH t AS (
      SELECT doc_id, lang, text,
             regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
      FROM documents WHERE length(lower(trim(text))) > 0
    ), scored AS (
      SELECT doc_id, lang, {_QUALITY} AS score FROM t
    ), ranked AS (
      SELECT doc_id, lang, score,
             CAST(ROW_NUMBER() OVER (PARTITION BY lang
                                     ORDER BY score, doc_id) - 1 AS DOUBLE)
             / GREATEST(COUNT(*) OVER (PARTITION BY lang) - 1, 1) AS pr
      FROM scored
    ), gl AS (
      SELECT score AS gscore,
             ROW_NUMBER() OVER (ORDER BY score, doc_id) AS rn
      FROM scored
    ), n AS (SELECT COUNT(*) AS n FROM scored)
    SELECT r.doc_id, r.lang, {R("r.score")} AS score, {R("r.pr")} AS pr,
           {R("g.gscore")} AS qnorm_score
    FROM ranked r CROSS JOIN n
    JOIN gl g ON g.rn = CAST(FLOOR(r.pr * (n.n - 1)) + 1 AS BIGINT)
"""
QUERIES["quantile_normalize"] = q_quantile_normalize


def q_inverted_index(spark, sf):
    """Positional inverted index build — the IR artifact behind the
    engine's sparse-similarity paths (tfidf_cosine_pairs, ppjoin) made
    explicit: per (word, doc) an ordered postings row with the in-doc
    position list, term frequency, and the word's document frequency.

    Scale shape: positions are collected per (word, doc) — a key whose
    cardinality is bounded by tokens — with sort_array making the list
    order deterministic under any partitioning (the H4 ordered-collect
    discipline); df joins back from a word-keyed partial-agg count.
    Stopword-class words (df > 90% of docs here — the template corpus has
    a compact, high-df vocabulary) are cut exactly as the sparse cosine
    path does — at corpus scale posting lists for those words are
    the skew hazard, and every real index drops or block-compresses them.
    """
    d = _t(spark, sf, "documents").where(
        F.length(F.lower(F.trim(F.col("text")))) > 0
    )
    # distinct-id count (not a row count): duplicated doc_id rows from a
    # re-ingested batch must not inflate the stopword threshold — and the
    # oracle counts DISTINCT, so the semantics must match exactly
    n_docs = d.select("doc_id").distinct().count()
    tok = d.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias(
            "pos", "word"
        ),
    ).where(F.col("word") != "")
    postings = tok.groupBy("word", "doc_id").agg(
        F.sort_array(F.collect_list("pos")).alias("positions"),
        F.count("*").alias("tf"),
    )
    df_counts = postings.groupBy("word").agg(
        F.countDistinct("doc_id").alias("df")
    )
    # no broadcast hint: the vocabulary relation grows with Heaps' law at
    # corpus scale (typos, URLs, numbers) — let the planner pick broadcast
    # while it fits and fall back to a shuffle join when it doesn't
    # positions is projected as a JSON string: the driver's pandas
    # canonicalizer cannot sort/hash list cells (r4 harness error), and
    # the JSON form is portable to the DuckDB oracle via to_json
    return (
        postings.join(df_counts.where(F.col("df") <= n_docs * 0.9), "word")
        .select(
            "word",
            "doc_id",
            F.to_json(F.col("positions")).alias("positions"),
            "tf",
            "df",
        )
    )


ORACLES["inverted_index"] = """
    WITH t AS (
      SELECT doc_id,
             regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
      FROM documents WHERE length(lower(trim(text))) > 0
    ), tok AS (
      SELECT doc_id, CAST(pos - 1 AS INTEGER) AS pos, toks[pos] AS word
      FROM t, UNNEST(range(1, len(toks) + 1)) AS u(pos)
      WHERE toks[pos] <> ''
    ), postings AS (
      SELECT word, doc_id,
             list_sort(list(pos)) AS positions,
             COUNT(*) AS tf
      FROM tok GROUP BY word, doc_id
    ), dfc AS (
      SELECT word, COUNT(DISTINCT doc_id) AS df FROM postings GROUP BY word
    ), n AS (
      SELECT COUNT(DISTINCT doc_id) AS n_docs
      FROM documents WHERE length(lower(trim(text))) > 0
    )
    SELECT p.word, p.doc_id,
           CAST(to_json(p.positions) AS VARCHAR) AS positions,
           p.tf, d.df
    FROM postings p JOIN dfc d USING (word) CROSS JOIN n
    WHERE d.df <= n.n_docs * 0.9
"""
QUERIES["inverted_index"] = q_inverted_index


def q_event_pattern(spark, sf):
    """CEP-style sequence-pattern matching (the MATCH_RECOGNIZE class of
    query, which Spark SQL lacks natively): encode each user's event
    history as an ordered symbol string (one letter per event type) and
    run an anchored regex over it — here "a view, then a purchase within
    at most two intervening non-purchase events" — counting matches per
    user.  Ordered collect uses the H4 discipline (sort by (ts, event_id)
    inside the aggregation) so the symbol string is partition-stable.

    Scale shape: one groupBy(user) with an ordered collect of 1-char
    symbols (state bounded by per-user event count), then a regex over the
    compact string — the standard distributed CEP reduction when sessions
    fit in a row; for unbounded streams the same pattern runs per
    watermarked session window.
    """
    e = _events(spark, sf).select("user_id", "ts", "event_id", "event_type")
    sym = e.withColumn(
        "sym", F.substring(F.col("event_type"), 1, 1)
    )  # click→c, signup→s, purchase→p, error→e, view→v (distinct initials)
    seq = sym.groupBy("user_id").agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct("ts", "event_id", F.col("sym").alias("s"))
                    )
                ),
                lambda r: r["s"],
            ),
        ).alias("seq")
    )
    pat = "v[^p]{0,2}p"
    return seq.select(
        "user_id",
        F.size(F.expr(f"regexp_extract_all(seq, '{pat}', 0)")).alias("n_matches"),
        F.length("seq").alias("n_events"),
    ).where(F.col("n_matches") > 0)


ORACLES["event_pattern"] = """
    WITH sym AS (
      SELECT user_id, ts, event_id, substr(event_type, 1, 1) AS s
      FROM events
    ), seq AS (
      SELECT user_id,
             string_agg(s, '' ORDER BY ts, event_id) AS seq
      FROM sym GROUP BY user_id
    )
    SELECT user_id,
           CAST(len(regexp_extract_all(seq, 'v[^p]{0,2}p')) AS INTEGER)
             AS n_matches,
           CAST(length(seq) AS INTEGER) AS n_events
    FROM seq
    WHERE len(regexp_extract_all(seq, 'v[^p]{0,2}p')) > 0
"""
QUERIES["event_pattern"] = q_event_pattern


def q_ngram_novelty(spark, sf):
    """Temporal novelty scoring: the fraction of each document's distinct
    word 3-grams whose FIRST corpus occurrence is the document itself
    (ties broken by doc_id order — the fixture's ingestion order).  A
    low-novelty doc is mostly re-treading earlier text: the streaming-era
    complement of dedup, used to down-weight late near-copies that no
    pairwise threshold catches.

    Scale shape: first-occurrence is one min-aggregate over (ngram_fp,
    doc_id) — only 16-byte fingerprints shuffle, never n-gram text; the
    per-doc score is a fingerprint-keyed join back plus a ratio aggregate.
    """
    n = 3
    d = _t(spark, sf, "documents").where(
        F.length(F.lower(F.trim(F.col("text")))) > 0
    )
    tok = d.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias(
            "pos0", "word"
        ),
    )
    w = Window.partitionBy("doc_id").orderBy("pos0")
    # gram parts derived from range(n): guard and gram share the same n,
    # so changing the gram order cannot silently desynchronize them
    parts = [F.col("word")] + [F.lead("word", i).over(w) for i in range(1, n)]
    gram = tok.select(
        "doc_id",
        F.when(
            F.lead("word", n - 1).over(w).isNotNull(),
            F.md5(F.concat_ws(" ", *parts)),
        ).alias("fp"),
    ).where(F.col("fp").isNotNull()).select("doc_id", "fp").distinct()
    first = gram.groupBy("fp").agg(F.min("doc_id").alias("first_doc"))
    return (
        gram.join(first, "fp")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            round4(
                F.avg(
                    F.when(F.col("first_doc") == F.col("doc_id"), 1.0).otherwise(
                        0.0
                    )
                )
            ).alias("novelty"),
        )
    )


ORACLES["ngram_novelty"] = f"""
    WITH t AS (
      SELECT doc_id,
             regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
      FROM documents WHERE length(lower(trim(text))) > 0
    ), gram AS (
      SELECT DISTINCT doc_id,
             md5(array_to_string(toks[pos:pos+2], ' ')) AS fp
      FROM t, UNNEST(range(1, len(toks) - 1)) AS u(pos)
      WHERE len(toks) >= 3
    ), first AS (
      SELECT fp, MIN(doc_id) AS first_doc FROM gram GROUP BY fp
    )
    SELECT g.doc_id,
           COUNT(*) AS n_grams,
           {R("AVG(CASE WHEN f.first_doc = g.doc_id THEN 1.0 ELSE 0.0 END)")}
             AS novelty
    FROM gram g JOIN first f USING (fp)
    GROUP BY g.doc_id
"""
QUERIES["ngram_novelty"] = q_ngram_novelty


def q_decayed_counts(spark, sf):
    """Half-life-decayed event counts per type — the trending-score
    formula (each event contributes 0.5^(age_days/7), ages measured from
    the corpus's newest day): a point-in-time decayed TOTAL, complementing
    ewma_smooth's per-day smoothed SERIES.  One scan + one partial-agg
    sum; the reference anchor (max day) is a broadcast scalar.
    """
    e = _events(spark, sf).select(
        "event_type", F.to_date("ts").alias("day")
    )
    anchor = e.agg(F.max("day").alias("maxd"))
    return (
        e.join(F.broadcast(anchor))
        .select(
            "event_type",
            F.pow(F.lit(0.5), F.datediff("maxd", "day") / F.lit(7.0)).alias("wt"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            round4(F.sum("wt")).alias("decayed_count"),
        )
    )


ORACLES["decayed_counts"] = f"""
    WITH e AS (
      SELECT event_type, CAST(ts AS DATE) AS day FROM events
    ), anchor AS (SELECT MAX(day) AS maxd FROM e)
    SELECT event_type,
           COUNT(*) AS n_events,
           {R("SUM(pow(0.5, date_diff('day', day, maxd) / 7.0))")}
             AS decayed_count
    FROM e CROSS JOIN anchor
    GROUP BY event_type
"""
QUERIES["decayed_counts"] = q_decayed_counts


def q_score_calibration(spark, sf):
    """Reliability-diagram data for the heuristic quality score: decile
    bins of the score vs the empirical rate of the 'en' slice per bin —
    the calibration check run before any score threshold ships to a
    curation gate.  One scan, one 10-row aggregate.
    """
    from batch_processing_pipeline_spark.functions.text_analysis import (
        quality_score,
    )

    d = _t(spark, sf, "documents").where(
        F.length(F.lower(F.trim(F.col("text")))) > 0
    )
    # bin on the PORTABLE-rounded score: both engines apply the same
    # round4 formula, so a raw score one ulp either side of a decile
    # boundary cannot bin differently across engines
    scored = d.select(
        F.least(F.floor(round4(quality_score(F.col("text"))) * 10), F.lit(9))
        .cast("int")
        .alias("bin"),
        quality_score(F.col("text")).alias("score"),
        F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("is_en"),
    )
    return scored.groupBy("bin").agg(
        F.count("*").alias("n"),
        round4(F.avg("score")).alias("mean_score"),
        round4(F.avg("is_en")).alias("en_rate"),
    )


ORACLES["score_calibration"] = f"""
    WITH t AS (
      SELECT doc_id, lang, text,
             regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
      FROM documents WHERE length(lower(trim(text))) > 0
    ), scored AS (
      SELECT CAST(LEAST(FLOOR(({R("(" + _QUALITY + ")")}) * CAST(10 AS DOUBLE)), 9)
                  AS INTEGER) AS bin,
             {_QUALITY} AS score,
             CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS is_en
      FROM t
    )
    SELECT bin, COUNT(*) AS n,
           {R("AVG(score)")} AS mean_score,
           {R("AVG(is_en)")} AS en_rate
    FROM scored GROUP BY bin
"""
QUERIES["score_calibration"] = q_score_calibration


def q_chi2_independence(spark, sf):
    """Two-way chi-square independence test: is event_type independent of
    hour-of-day? (The drift/seasonality smell test run before trusting
    per-hour aggregates; complements benford_audit's one-way
    goodness-of-fit.)  Observed counts per (type, hour) vs expected
    row_total*col_total/N — three partial-agg passes over a contingency
    relation whose size is |types| x 24, then one scalar.
    """
    e = _events(spark, sf).select(
        "event_type", F.hour("ts").alias("hr")
    )
    obs = e.groupBy("event_type", "hr").agg(F.count("*").alias("o"))
    row_t = obs.groupBy("event_type").agg(F.sum("o").alias("rt"))
    col_t = obs.groupBy("hr").agg(F.sum("o").alias("ct"))
    # N from the row totals INSIDE the DAG (no second eager scan of
    # events); row/col marginals cast to double before multiplying — the
    # bigint product rt*ct overflows long at ~1.5e10 concentrated events
    n_rel = row_t.agg(F.sum("rt").cast("double").alias("nn"))
    # FULL grid: a zero-observed cell still contributes (0-exp)^2/exp =
    # exp; dropping absent cells understates chi2 exactly when the data
    # is most skewed (and dof would still count them)
    grid = row_t.select("event_type", "rt").crossJoin(
        col_t.select("hr", "ct")
    )
    cells = (
        grid.join(obs, ["event_type", "hr"], "left")
        .join(F.broadcast(n_rel))
        .select(
            "event_type",
            "hr",
            F.coalesce(F.col("o"), F.lit(0)).alias("o"),
            (
                F.col("rt").cast("double") * F.col("ct").cast("double")
                / F.col("nn")
            ).alias("exp"),
        )
    )
    chi2 = F.sum(
        (F.col("o") - F.col("exp")) * (F.col("o") - F.col("exp")) / F.col("exp")
    )
    return cells.agg(
        round4(chi2).alias("chi2"),
        (
            (F.countDistinct("event_type") - 1) * (F.countDistinct("hr") - 1)
        ).cast("bigint").alias("dof"),
        F.sum("o").alias("n_events"),
    )


ORACLES["chi2_independence"] = f"""
    WITH e AS (
      SELECT event_type, EXTRACT(hour FROM ts) AS hr FROM events
    ), obs AS (
      SELECT event_type, hr, COUNT(*) AS o FROM e GROUP BY event_type, hr
    ), row_t AS (
      SELECT event_type, SUM(o) AS rt FROM obs GROUP BY event_type
    ), col_t AS (
      SELECT hr, SUM(o) AS ct FROM obs GROUP BY hr
    ), n AS (SELECT CAST(SUM(rt) AS DOUBLE) AS n FROM row_t),
    cells AS (
      SELECT g.event_type, g.hr, COALESCE(obs.o, 0) AS o,
             CAST(g.rt AS DOUBLE) * CAST(g.ct AS DOUBLE) / n.n AS exp
      FROM (SELECT row_t.event_type, row_t.rt, col_t.hr, col_t.ct
            FROM row_t CROSS JOIN col_t) g
      LEFT JOIN obs ON obs.event_type = g.event_type AND obs.hr = g.hr
      CROSS JOIN n
    )
    SELECT {R("SUM((o - exp) * (o - exp) / exp)")} AS chi2,
           CAST((COUNT(DISTINCT event_type) - 1) * (COUNT(DISTINCT hr) - 1)
                AS BIGINT) AS dof,
           CAST(SUM(o) AS BIGINT) AS n_events
    FROM cells
"""
QUERIES["chi2_independence"] = q_chi2_independence


def q_temporal_split(spark, sf):
    """Time-based train/eval split with a leakage audit: events strictly
    before the cutoff (day 25 of the fixture month) are train, the rest
    eval, and the audit row reports the leakage population: n_users =
    users appearing on BOTH sides, n_events = the EVAL-side events of
    those users (the rows a leakage-free protocol would quarantine —
    temporal splits, not random ones, are how eval sets are cut for
    forecasting and for contamination-sensitive LLM evals).  Two
    partial-agg passes; the user-overlap is a semi-join on user_id.
    """
    e = _events(spark, sf).select(
        "user_id", F.to_date("ts").alias("day")
    )
    cutoff = F.lit("2024-01-25").cast("date")
    tagged = e.select(
        "user_id", F.when(F.col("day") < cutoff, "train").otherwise("eval").alias("split")
    )
    sides = tagged.groupBy("split").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )
    train_u = tagged.where(F.col("split") == "train").select("user_id").distinct()
    leaked_eval = tagged.where(F.col("split") == "eval").join(
        train_u, "user_id", "left_semi"
    )
    overlap = leaked_eval.agg(
        F.lit("overlap").alias("split"),
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )
    return sides.unionByName(overlap)


ORACLES["temporal_split"] = """
    WITH tagged AS (
      SELECT user_id,
             CASE WHEN CAST(ts AS DATE) < DATE '2024-01-25'
                  THEN 'train' ELSE 'eval' END AS split
      FROM events
    ), sides AS (
      SELECT split, COUNT(*) AS n_events,
             COUNT(DISTINCT user_id) AS n_users
      FROM tagged GROUP BY split
    ), ov AS (
      SELECT 'overlap' AS split,
             COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users
      FROM tagged
      WHERE split = 'eval' AND user_id IN (
        SELECT DISTINCT user_id FROM tagged WHERE split = 'train'
      )
    )
    SELECT * FROM sides UNION ALL SELECT * FROM ov
"""
QUERIES["temporal_split"] = q_temporal_split


def q_skipping_audit(spark, sf):
    """Data-skipping layout audit: per partition key (event day), the
    min/max of the value column — the zone-map statistics a lakehouse
    scanner consults — plus, for a reference predicate (value > 90), each
    partition's verdict: 'skip' (max below), 'full' (min above), or
    'scan'.  The audit quantifies how much a predicate can prune under
    the CURRENT layout; run before and after a re-cluster (zorder_key) it
    measures the layout change's worth.  One partial-agg pass.

    The verdict is computed from the UNROUNDED min/max (what a real
    zone-map scanner consults); round4 applies only to the displayed
    min_v/max_v columns — a partition whose true max is 90.00004 must
    read 'scan', not 'skip', even though its displayed max shows 90.0.
    """
    e = _events(spark, sf).select(F.to_date("ts").alias("day"), "value")
    thr = 90.0
    stats = e.groupBy("day").agg(
        F.count("*").alias("n_rows"),
        F.min("value").alias("_raw_min"),
        F.max("value").alias("_raw_max"),
    )
    return stats.select(
        "day",
        "n_rows",
        round4(F.col("_raw_min")).alias("min_v"),
        round4(F.col("_raw_max")).alias("max_v"),
        F.when(F.col("_raw_max") <= thr, "skip")
        .when(F.col("_raw_min") > thr, "full")
        .otherwise("scan")
        .alias("verdict"),
    )


ORACLES["skipping_audit"] = f"""
    WITH stats AS (
      SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_rows,
             MIN(value) AS raw_min, MAX(value) AS raw_max
      FROM events GROUP BY CAST(ts AS DATE)
    )
    SELECT day, n_rows,
           {R("raw_min")} AS min_v, {R("raw_max")} AS max_v,
           CASE WHEN raw_max <= 90.0 THEN 'skip'
                WHEN raw_min > 90.0 THEN 'full'
                ELSE 'scan' END AS verdict
    FROM stats
"""
QUERIES["skipping_audit"] = q_skipping_audit


def q_cumulative_reach(spark, sf):
    """Cumulative distinct-user reach by day — the DAU companion metric
    ("how many unique users have we EVER seen by day d"), computed without
    any distinct-over-window: each user reduces to their first-seen day
    (one partial-agg MIN), days aggregate first-seen counts, and a running
    sum over the day order yields the reach curve.  At 100 TB the only
    wide operation is the user-keyed MIN; the window runs over |days|
    rows.
    """
    e = _events(spark, sf).select("user_id", F.to_date("ts").alias("day"))
    first_seen = e.groupBy("user_id").agg(F.min("day").alias("first_day"))
    per_day = first_seen.groupBy("first_day").agg(
        F.count("*").alias("new_users")
    )
    w = Window.orderBy("first_day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return per_day.select(
        F.col("first_day").alias("day"),
        "new_users",
        F.sum("new_users").over(w).alias("cumulative_users"),
    )


ORACLES["cumulative_reach"] = """
    WITH first_seen AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
      FROM events GROUP BY user_id
    ), per_day AS (
      SELECT first_day, COUNT(*) AS new_users
      FROM first_seen GROUP BY first_day
    )
    SELECT first_day AS day, new_users,
           CAST(SUM(new_users) OVER (ORDER BY first_day
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS BIGINT) AS cumulative_users
    FROM per_day
"""
QUERIES["cumulative_reach"] = q_cumulative_reach


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
    agg_cols = [
        F.count(F.lit(1)).cast("long").alias("n"),
        round4(F.sum("value")).alias("sum_v"),
    ]
    app = re.sub(r"[^A-Za-z0-9_]", "_", spark.sparkContext.applicationId)
    tag = f"{app}_{hashlib.md5(os.path.abspath(sf).encode()).hexdigest()[:8]}"
    store = f"/tmp/bpps_cagg/{tag}"
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
        "event_type", F.col("hour_bucket").cast("timestamp").alias("hour_bucket"),
        "n", "sum_v",
    )


ORACLES["continuous_aggregate"] = f"""
    SELECT event_type,
           date_trunc('hour', ts) AS hour_bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           {R("SUM(value)")} AS sum_v
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
    per_v = e.groupBy(F.col("value").alias("v")).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("nb"),
    )
    w_cum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    cum = per_v.select(
        F.sum("na").over(w_cum).alias("ca"),
        F.sum("nb").over(w_cum).alias("cb"),
        F.sum("na").over(w_all).alias("ta"),
        F.sum("nb").over(w_all).alias("tb"),
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
    w_cum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    ranked = per_v.select(
        "cnt",
        "na_v",
        (
            (F.sum("cnt").over(w_cum) - F.col("cnt")).cast("double")
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
    The only global window runs over the DISTINCT vocabulary."""
    d = _t(spark, sf, "documents")
    words = d.select(
        F.explode(F.split("text", " ", -1)).alias("w")
    ).where(F.col("w") != "")
    freq = words.groupBy("w").agg(F.count(F.lit(1)).alias("n"))
    w_rank = Window.orderBy(F.col("n").desc(), F.col("w").asc())
    pts = freq.select(
        F.log(F.row_number().over(w_rank).cast("double")).alias("x"),
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
    rev = li.groupBy(F.col("l_partkey").alias("p")).agg(
        F.sum(F.col("l_extendedprice") * (1.0 - F.col("l_discount"))).alias(
            "revenue"
        )
    )
    w_cum = Window.orderBy(F.col("revenue").desc(), F.col("p").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_tot = Window.partitionBy()
    # the class boundary is tested on a round4-ed share: Spark's running
    # window sum and DuckDB's segment-tree window aggregation can
    # associate float additions differently, so a raw cum_share within
    # ~1ulp of 0.80/0.95 could flip class between engines (ADVICE r4)
    classed = rev.select(
        "p",
        "revenue",
        round4(
            F.sum("revenue").over(w_cum) / F.sum("revenue").over(w_tot)
        ).alias("cum_share"),
    ).select(
        "p",
        "revenue",
        F.when(F.col("cum_share") <= 0.80, "A")
        .when(F.col("cum_share") <= 0.95, "B")
        .otherwise("C")
        .alias("abc_class"),
    )
    tot = rev.agg(F.sum("revenue").alias("tot"))
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum("revenue").alias("_rev"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "abc_class",
            "n_parts",
            round4(F.col("_rev")).alias("class_revenue"),
            round4(F.col("_rev") / F.col("tot")).alias("revenue_share"),
        )
    )


ORACLES["pareto_abc"] = f"""
    WITH rev AS (
      SELECT l_partkey AS p,
             SUM(l_extendedprice * (1.0 - l_discount)) AS revenue
      FROM lineitem GROUP BY 1
    ), classed AS (
      SELECT p, revenue,
             CASE WHEN {R("SUM(revenue) OVER (ORDER BY revenue DESC, p ASC "
                          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
                          " / SUM(revenue) OVER ()")} <= 0.80 THEN 'A'
                  WHEN {R("SUM(revenue) OVER (ORDER BY revenue DESC, p ASC "
                          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
                          " / SUM(revenue) OVER ()")} <= 0.95 THEN 'B'
                  ELSE 'C' END AS abc_class
      FROM rev
    )
    SELECT abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           {R("SUM(revenue)")} AS class_revenue,
           {R("SUM(revenue) / (SELECT SUM(revenue) FROM rev)")}
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
            round4(F.sum("revenue")).alias("attributed_revenue"),
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
           {R("SUM(revenue)")} AS attributed_revenue
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
    independent) but the peel is iterative-stateful, so there is no SQL
    oracle (rows-only driver check); pytest pins the result against a
    brute-force peel, the kcenter_coreset precedent.
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
        .persist()
    )
    k = 2
    cur = edges.localCheckpoint(eager=True)
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
        if nxt.count() == cur.count():
            cur = nxt
            converged = True
            break
        cur = nxt
    edges.unpersist()
    if not converged:
        # an unconverged peel is a supergraph of the true k-core — fail
        # loudly rather than emit a silently-wrong result (a long cascade
        # chain at larger SF can exceed the round cap)
        raise RuntimeError("k_core: peel did not reach fixpoint in 30 rounds")
    deg = (
        cur.select(F.col("u").alias("part"))
        .unionByName(cur.select(F.col("v").alias("part")))
        .groupBy("part")
        .agg(F.count(F.lit(1)).cast("long").alias("core_degree"))
    )
    return deg.select(F.col("part").cast("long").alias("part"), "core_degree")


# k=2 peel is iterative-stateful (each round's degree depends on the
# previous round's survivor set); a SQL twin needs aggregation over the
# recursive reference, which neither engine's recursive CTE allows — so
# the oracle is omitted (rows-only driver check) and the fixpoint is
# pinned in pytest against a brute-force peel (the kcenter_coreset
# precedent for inherently iterative ops).
ORACLES["k_core"] = None
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
    first = e.groupBy("user_id").agg(
        F.to_date(F.date_trunc("day", F.min("ts"))).alias("cohort")
    )
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
        .agg(F.sum("value").alias("rev"))
    )
    grid = act.join(rev, ["cohort", "age"], "left").select(
        "cohort", "age", F.coalesce("rev", F.lit(0.0)).alias("rev")
    )
    w_cum = (
        Window.partitionBy("cohort")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = grid.select(
        "cohort", "age", F.sum("rev").over(w_cum).alias("cum_rev")
    )
    return (
        cum.join(F.broadcast(sizes), "cohort")
        .select(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort"),
            F.col("age").cast("long").alias("age"),
            F.col("cohort_users").cast("long").alias("cohort_users"),
            round4(F.col("cum_rev")).alias("cum_revenue"),
            round4(F.col("cum_rev") / F.col("cohort_users")).alias(
                "ltv_per_user"
            ),
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
             SUM(e.value) AS rev
      FROM events e JOIN first f ON f.user_id = e.user_id
      WHERE e.event_type = 'purchase'
      GROUP BY 1, 2
    ), grid AS (
      SELECT a.cohort, a.age, COALESCE(r.rev, 0.0) AS rev
      FROM act a LEFT JOIN rev r ON r.cohort = a.cohort AND r.age = a.age
    ), cum AS (
      SELECT cohort, age,
             SUM(rev) OVER (PARTITION BY cohort ORDER BY age
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rev
      FROM grid
    )
    SELECT strftime(c.cohort, '%Y-%m-%d') AS cohort,
           CAST(c.age AS BIGINT) AS age,
           CAST(s.cohort_users AS BIGINT) AS cohort_users,
           {R("c.cum_rev")} AS cum_revenue,
           {R("c.cum_rev / s.cohort_users")} AS ltv_per_user
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
        round4(F.sum("o_totalprice")).alias("total_price"),
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("first_date"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("last_date"),
    )


ORACLES["orc_roundtrip"] = f"""
    SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
           {R("SUM(o_totalprice)")} AS total_price,
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
    STRICTLY preceding points — one dimension-ordered window over the
    distinct-pair relation, no pairwise dominance join (the O(n²) trap).
    Distinct-pair collapse first makes equal-point handling exact:
    duplicates are one point, and the window needs no tie rules."""
    o = _t(spark, sf, "orders")
    pts = o.select(
        F.col("o_totalprice").alias("price"),
        F.to_date("o_orderdate").alias("d"),
    ).distinct()
    w = Window.orderBy(F.col("price").asc(), F.col("d").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    flagged = pts.select(
        "price",
        "d",
        F.max("d").over(w).alias("best_prev"),
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
    tbl = f"events_rollup_{tag}"
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
            F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv")
        ).write.format("parquet").saveAsTable(tbl)
        tail = (
            e.where(F.col("d") >= F.lit(cutoff))
            .groupBy("d", "event_type")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv"))
        )
        tail.write.insertInto(tbl)
    return spark.table(tbl).groupBy("event_type").agg(
        F.sum("n").cast("long").alias("n_events"),
        F.countDistinct("d").alias("n_days"),
        round4(F.sum("sv")).alias("total_value"),
    )


ORACLES["managed_table"] = f"""
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
           {R("SUM(value)")} AS total_value
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

    Scale shape: ranks come from one cumulative window over DISTINCT
    scores (value-cardinality bounded, the ks_test discipline), never a
    global per-row sort."""
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
    w_cum = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, 0)
    ranked = per_s.select(
        "s",
        "cnt",
        "pos",
        (
            (F.sum("cnt").over(w_cum) - F.col("cnt")).cast("double")
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
    never an all-pairs scan. Pairs sharing >= 3 fingerprints emit."""
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
    fps = sel.select(
        "doc_id", (F.col("sel_key") / 4096).cast("bigint").alias("fh")
    ).distinct()
    hot = fps.groupBy("fh").agg(F.countDistinct("doc_id").alias("df")).where(
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
        .agg(F.count(F.lit(1)).alias("n_purch"), round4(F.sum("value")).alias("rev"))
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
             {R("SUM(value)")} AS rev
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
    NTILE over the per-user relation (users, not events — the correct
    uplift unit); everything else is conditional aggregation + one
    cumulative window over 10 rows."""
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
    # user_id tie-break gives NTILE a TOTAL order — equal scores would
    # otherwise bucket engine-dependently
    decile = F.ntile(10).over(
        Window.orderBy(F.col("score").desc(), F.col("user_id").asc())
    )
    binned = scored.select("converted", "treat", decile.alias("decile"))
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
        .agg(F.sum("o_totalprice").alias("r"))
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
        F.sum(2.0 * F.col("cum") - F.col("r")).alias("lorenz2"),
        F.sum(F.col("r") * F.col("r")).alias("sq"),
    )
    return per_seg.select(
        F.col("c_mktsegment").alias("segment"),
        F.col("n").cast("long").alias("n_customers"),
        round4(
            1.0 - F.col("lorenz2") / (F.col("n") * F.col("tot"))
        ).alias("gini"),
        round4(F.col("sq") / (F.col("tot") * F.col("tot"))).alias("hhi"),
    )


ORACLES["gini_concentration"] = f"""
    WITH rev AS (
      SELECT o.o_custkey, SUM(o.o_totalprice) AS r, c.c_mktsegment
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
           {R("1.0 - SUM(2.0 * cum - r) / (MAX(n) * MAX(tot))")} AS gini,
           {R("SUM(r * r) / (MAX(tot) * MAX(tot))")} AS hhi
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
    # rank on the ROUND4-ed score: raw-double ordering can flip near-ties
    # on cross-engine ulp drift (partial-agg sum order); equal rounded
    # scores resolve by the md5 tie-break
    w_rank = Window.orderBy(
        round4(F.col("score")).desc(),
        F.md5(F.col("doc_id").cast("string")).asc(),
    )
    return (
        scored.select(
            "doc_id", round4(F.col("score")).alias("bm25"),
            F.row_number().over(w_rank).alias("rk"),
        )
        .where(F.col("rk") <= 20)
        .select("rk", "doc_id", "bm25")
    )


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
    rise = (F.col("f2") + 1.0) / (F.col("f1") + 1.0)
    w_rank = Window.orderBy(
        round4(rise).desc(), F.md5(F.col("w")).asc()
    )
    return (
        counts.select(
            F.col("w").alias("term"),
            F.col("f1").cast("long").alias("n_first_half"),
            F.col("f2").cast("long").alias("n_second_half"),
            round4(rise).alias("rise_ratio"),
            F.row_number().over(w_rank).alias("rk"),
        )
        .where(F.col("rk") <= 15)
        .select("rk", "term", "n_first_half", "n_second_half", "rise_ratio")
    )


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
    with a total-order tie-break (the qini_uplift lesson), one
    conditional aggregation per stratum, weighted reduce; empty arms
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
    scored = per_user.select(
        "y",
        (h % 2 == 0).cast("int").alias("t"),
        F.ntile(5)
        .over(Window.orderBy(F.col("activity").desc(), F.col("user_id").asc()))
        .alias("stratum"),
    )
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
