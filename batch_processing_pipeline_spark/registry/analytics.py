"""Registry section: analytics surface: graph (pagerank/triangles), sketches, sampling, packing, joins, text statistics.

Split from the former single-file registry (round 7); registers its
queries into the shared ``QUERIES``/``ORACLES`` dicts at import time.
"""

from __future__ import annotations

from batch_processing_pipeline_spark.functions.rounding import (
    cents,
    sql_cents,
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
from batch_processing_pipeline_spark.registry.core import _QUALITY  # noqa: F401

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


#: 20 merges learned once from the fixture corpus family
#: (learn_bpe_merges at sf0.01; training is deterministic — tie-broken —
#: and covered by bpe_merge_candidates + the golden-merges pytest).
#: Pinned as literals so the APPLY pass is corpus-independent. Every pair
#: has first != second — load-bearing for the SQL oracle: with no
#: self-adjacent merge, same-rank occurrences are token-disjoint, so the
#: per-rank rewrite fixpoint is order-independent and a bounded
#: replace-chain computes it exactly (see the oracle builder below).
_BPE_PINNED_MERGES = [
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"), ("s", "t"),
    ("m", "er"), ("a", "t"), ("l", "u"), ("a", "r"), ("p", "ar"),
    ("j", "o"), ("jo", "in"), ("a", "s"), ("as", "h"), ("h", "ash"),
    ("r", "ow"), ("at", "c"), ("atc", "h"), ("b", "atch"), ("a", "n"),
]


def q_bpe_encode(spark, sf):
    """BPE tokenizer APPLY pass — the 100-TB side of the tokenizer: the
    pinned merge-rank table (trained once, ``_BPE_PINNED_MERGES``)
    broadcasts in a pandas-UDF closure with an executor-local
    distinct-word cache (functions/bpe.py). Training stays covered by
    ``bpe_merge_candidates`` (driver-green) and the golden-merges pytest;
    pinning the ranks makes THIS query SQL-expressible, so the driver
    hash-checks the Arrow kernel against a pure-SQL replace-chain twin
    (GPT-2 greedy min-rank == apply-ranks-in-order-to-fixpoint, because a
    merge of rank r only ever creates pairs of rank > r).
    """
    from batch_processing_pipeline_spark.functions.bpe import bpe_encode

    d = _t(spark, sf, "documents")
    enc = bpe_encode(d.select("doc_id", "text"), _BPE_PINNED_MERGES)
    return enc.select(
        "doc_id",
        F.size("bpe_tokens").alias("n_bpe"),
        F.element_at("bpe_tokens", 1).alias("first_tok"),
    )


def _bpe_replace_chain(var: str) -> str:
    """The replace-chain SQL expression encoding one word (``var``) into
    its space-joined BPE symbol string (shared with
    eval_stats.bpe_compression_by_lang)."""
    chain = f"' ' || regexp_replace({var}, '(.)', '\\1 ', 'g')"
    for a, b in _BPE_PINNED_MERGES:
        for _ in range(3):
            chain = f"replace({chain}, ' {a} {b} ', ' {a}{b} ')"
    return chain


def _bpe_encode_oracle() -> str:
    """SQL twin of the greedy min-rank BPE apply, as a replace-chain.

    Each word becomes a space-delimited symbol string (' a b c '); each
    pinned merge (a, b) rewrites ' a b ' -> ' ab ', applied THREE times:
    rank-r merges never create rank-<=r pairs (any new pair contains the
    merged token, learned later), so processing ranks in order to
    per-rank fixpoint equals the greedy loop — and because no pinned
    merge is self-adjacent (a != b), same-rank occurrences are
    token-disjoint and TWO replace passes reach that fixpoint (pass one
    can miss alternate occurrences that share a boundary space; the
    survivors are then isolated); the third pass is margin.
    """
    chain = _bpe_replace_chain("w")
    return f"""
    WITH w AS (
      SELECT doc_id,
             COALESCE(list_filter(
               regexp_split_to_array(lower(trim(text)), '\\s+'),
               x -> length(x) > 0), []) AS words
      FROM documents
    ), enc AS (
      SELECT doc_id,
             flatten(list_transform(words,
               w -> string_split(trim({chain}), ' '))) AS toks
      FROM w
    )
    SELECT doc_id, CAST(len(toks) AS INTEGER) AS n_bpe,
           toks[1] AS first_tok
    FROM enc
"""


ORACLES["bpe_encode"] = _bpe_encode_oracle()
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
    # trigram leads ride the SAME user window (round 12 fifth session,
    # guide §2.4): sessions are contiguous and non-decreasing in user
    # order by construction, so "two rows ahead within my session" ≡
    # "two rows ahead within my user AND lead(session_id, 2) equals my
    # session_id" — the historical second window partitioned by
    # (user_id, session_id) cost a second full exchange + sort of the
    # event relation for the same rows.
    path = F.concat_ws(
        ">",
        F.col("event_type"),
        F.lead("event_type", 1).over(wu),
        F.lead("event_type", 2).over(wu),
    )
    trigrams = sess.select(
        path.alias("path"),
        (F.lead("session_id", 2).over(wu) == F.col("session_id")).alias("_same"),
    ).where(F.col("_same"))
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
    # Every CTE is MATERIALIZED (round-11): DuckDB inlines plain CTEs at
    # each reference, so the chained unrolled iteration re-evaluated the
    # 6M-row distinct edge join once per step and held every copy's hash
    # tables concurrently — at the sf1 fixture that spilled past an 80 GB
    # temp budget and failed with ENOSPC. Materialization makes the chain
    # strictly linear: each relation computes once.
    head = """
    WITH cs AS MATERIALIZED (
      SELECT DISTINCT o.o_custkey + 1000000 AS c, l.l_suppkey AS s
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ), edges AS MATERIALIZED (
      SELECT c AS src, s AS dst FROM cs
      UNION ALL
      SELECT s AS src, c AS dst FROM cs
    ), deg AS MATERIALIZED (
      SELECT src, COUNT(*) AS out_deg FROM edges GROUP BY src
    ), nodes AS MATERIALIZED (
      SELECT DISTINCT src AS node FROM edges
      UNION SELECT DISTINCT dst FROM edges
    ), nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
    r0 AS MATERIALIZED (
      SELECT node, CAST(1.0 AS DOUBLE) / nn.n AS rank FROM nodes, nn
    )"""
    steps = []
    for i in range(1, iterations + 1):
        steps.append(f""",
    r{i} AS MATERIALIZED (
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


def q_pagerank_dangling(spark, sf):
    """PageRank WITH dangling-mass redistribution on a sink-heavy graph:
    the DIRECTED customer -> supplier purchase graph, where every supplier
    is a pure sink (no out-edges). Plain PageRank leaks their whole rank
    each round; ``redistribute_dangling=True`` re-injects it uniformly
    (one scalar aggregate per round — operators/pagerank.py), conserving
    total mass at 1.0. The oracle unrolls the identical iteration as
    chained CTEs with a per-round scalar dangling-mass term, so the
    mass-conserving semantics — not just the ranking — are hash-pinned."""
    from batch_processing_pipeline_spark.operators.pagerank import pagerank

    l = _t(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    o = _t(spark, sf, "orders").select("o_orderkey", "o_custkey")
    edges = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(
            (F.col("o_custkey") + F.lit(1_000_000)).alias("src"),
            F.col("l_suppkey").alias("dst"),
        )
        .distinct()
    )
    ranks = pagerank(edges, iterations=5, redistribute_dangling=True)
    return ranks.select("node", round4(F.col("rank") * 1000.0).alias("rank_k"))


def _pagerank_dangling_oracle(iterations: int = 5, damping: float = 0.85) -> str:
    # MATERIALIZED is load-bearing here (round-11): r{i-1} is referenced
    # TWICE per step (the dangling-mass scalar and the contribution sum),
    # so plain-CTE inlining grew the plan EXPONENTIALLY in the iteration
    # count — 2^5 copies of the 6M-row edge join at the sf1 fixture,
    # ENOSPC after ~80 GB of spill. Materialization computes each round
    # exactly once.
    head = """
    WITH edges AS MATERIALIZED (
      SELECT DISTINCT o.o_custkey + 1000000 AS src, l.l_suppkey AS dst
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ), deg AS MATERIALIZED (
      SELECT src, COUNT(*) AS out_deg FROM edges GROUP BY src
    ), nodes AS MATERIALIZED (
      SELECT DISTINCT src AS node FROM edges
      UNION SELECT DISTINCT dst FROM edges
    ), nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
    dang AS MATERIALIZED (
      SELECT node FROM nodes WHERE node NOT IN (SELECT src FROM deg)
    ),
    r0 AS MATERIALIZED (
      SELECT node, CAST(1.0 AS DOUBLE) / nn.n AS rank FROM nodes, nn
    )"""
    steps = []
    for i in range(1, iterations + 1):
        steps.append(f""",
    dm{i} AS MATERIALIZED (
      SELECT COALESCE(SUM(r.rank), CAST(0.0 AS DOUBLE)) AS m
      FROM r{i - 1} r JOIN dang ON r.node = dang.node
    ),
    r{i} AS MATERIALIZED (
      SELECT nodes.node,
             ((CAST(1.0 AS DOUBLE) - CAST({damping} AS DOUBLE)) / nn.n
              + CAST({damping} AS DOUBLE) * dm{i}.m / nn.n)
             + CAST({damping} AS DOUBLE) * COALESCE(contrib.in_sum, CAST(0.0 AS DOUBLE)) AS rank
      FROM nodes CROSS JOIN nn CROSS JOIN dm{i}
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
    SELECT node, {sql_round4("rank * CAST(1000.0 AS DOUBLE)")} AS rank_k
    FROM r{iterations}
    """
    return head + "".join(steps) + tail


ORACLES["pagerank_dangling"] = _pagerank_dangling_oracle()
QUERIES["pagerank_dangling"] = q_pagerank_dangling


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
    # ONE explode pass (round 12 fifth session, guide §3.3): `grams` fed
    # THREE consumers (document frequency, per-doc totals, the boiler
    # count), each re-running the tokenize + 5-gram xxhash explode from
    # the scan. One (doc, gram) partial aggregation — pinned — carries
    # everything the three consumers need: count-per-(doc,gram) sums to
    # the per-doc totals, and its per-gram row count IS countDistinct(doc)
    # (the relation is distinct on (doc, gram) by construction).
    gd = (
        grams.groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    df_counts = gd.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    common = df_counts.where(F.col("df") >= 3).select("g")
    per_doc = gd.groupBy("doc_id").agg(F.sum("c").alias("n_grams"))
    boiler = (
        gd.join(F.broadcast(common), "g", "left_semi")
        .groupBy("doc_id")
        .agg(F.sum("c").alias("n_boiler"))
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
        # exact 1e-4-dollar units (r12 integer-cents sweep)
        round4(
            F.sum(
                cents(F.col("l_extendedprice"))
                * (F.lit(100).cast("long") - cents(F.col("l_discount")))
            )
            / F.lit(10000.0)
        ).alias("revenue"),
    )


ORACLES["smb_join"] = f"""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_items,
           {R(f"SUM({sql_cents('l.l_extendedprice')} * (100 - {sql_cents('l.l_discount')})) / CAST(10000.0 AS DOUBLE)")} AS revenue
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
        # materialized ONCE (round 12, guide §3.3): the triangle join
        # reads edges from THREE branches — without the checkpoint the
        # whole upstream (lineitem self-join, pair agg, k-NN window,
        # distinct) re-ran per branch (12 scans in the before-plan).
        # The relation is bounded at k·n rows by the sparsification, so
        # the pin is small at any scale. Measured (same-session A/B,
        # sf0.1): 2.66 → 2.52 s; checkpointing `pairs` as well was
        # SLOWER (2.79 s — a second serialized materialization for a
        # subtree whose two union branches already share one exchange).
        .localCheckpoint(eager=True)
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


def q_sim_topk_ivfpq(spark, sf):
    """IVF-PQ (IVFADC) cosine top-10 with exact re-rank
    (operators/ivfpq.py) — the composition the two standalone ANN paths
    build toward: IVF prunes WHICH vectors scan (nprobe=4 of 8 cells),
    PQ compresses HOW (m=16 nibble codes of the RESIDUAL vs the cell
    centroid — tighter distribution than raw vectors, so the same code
    budget buys more recall than sim_topk_pq's raw-vector books).
    Rows-only by design (k-means is seed-dependent); the recall-vs-nprobe
    sweep and the residual-beats-raw property are pinned in
    tests/test_ivfpq.py.
    """
    from batch_processing_pipeline_spark.operators.ivfpq import (
        ivfpq_topk,
        train_ivfpq,
    )

    emb = _t(spark, sf, "embeddings")
    cents, books = train_ivfpq(emb, k_coarse=8, m=16, ksub=16, seed=42)
    return ivfpq_topk(
        emb.where(F.col("vec_id") < 5), emb, cents, books,
        k=10, nprobe=4, refine=50,
    ).select("query_id", "vec_id", "rank", round4(F.col("cosine")).alias("cosine"))


ORACLES["sim_topk_ivfpq"] = None
QUERIES["sim_topk_ivfpq"] = q_sim_topk_ivfpq


def q_ivfpq_index_drift(spark, sf):
    """Incremental ANN index maintenance accounting (operators/ivfpq.py
    ``append_to_ivfpq_index``): persist the IVFADC index over a corpus
    snapshot (vec_id % 3 != 0), append the refresh batch (vec_id % 3 == 0)
    at the FROZEN centroids/codebooks — O(batch) work, history never
    re-encoded — and return the per-cell residual-drift audit: appended
    count, the batch's mean residual norm vs the baseline recorded at
    save time, and their ratio (the re-train signal; ~1.0 here because
    fixture halves share one distribution). Rows-only by design (k-means
    is seed-dependent); appended == from-scratch-encode at frozen books
    is pinned exactly in tests/test_ivfpq.py. The audit materializes
    (localCheckpoint) before the scratch index is removed. Acting on the
    signal is ``refresh_ivfpq_index`` (round 10): cell-local codebook
    re-train + re-encode of ONLY the drifted cells, pinned in the same
    test module.
    """
    import shutil
    import tempfile

    from batch_processing_pipeline_spark.operators.ivfpq import (
        append_to_ivfpq_index,
        save_ivfpq_index,
        train_ivfpq,
    )

    emb = _t(spark, sf, "embeddings")
    snap = emb.where(F.col("vec_id") % 3 != 0)
    fresh = emb.where(F.col("vec_id") % 3 == 0)
    cents, books = train_ivfpq(snap, k_coarse=8, m=16, ksub=16, seed=42)
    work = tempfile.mkdtemp(prefix="ivfpq_drift_")
    try:
        save_ivfpq_index(snap, f"{work}/index", cents, books)
        audit = append_to_ivfpq_index(
            fresh, f"{work}/index", refresh_id=1
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return audit.select(
        "cell",
        "n_new",
        round4(F.col("mean_res_norm_new")).alias("mean_res_norm_new"),
        round4(F.col("mean_res_norm_baseline")).alias("mean_res_norm_baseline"),
        round4(F.col("drift")).alias("drift"),
    )


ORACLES["ivfpq_index_drift"] = None
QUERIES["ivfpq_index_drift"] = q_ivfpq_index_drift


def q_dup_spans(spark, sf):
    """Repeated-span detection (the substring-level dedup of Lee et al.
    2022, "Deduplicating Training Data Makes Language Models Better"):
    every 8-token window of every document is fingerprinted; spans whose
    fingerprint occurs more than once ACROSS the corpus are flagged with
    their in-document position — the removal list a span-dedup pass feeds
    a slicer.  Fourth granularity of dedup beside whole-doc (exact),
    near-doc (MinHash/SimHash/PPJoin), and cross-set (decontaminate).

    Scale shape: spans never leave their row as text — only the 16-byte
    fingerprint exits to the one fingerprint-keyed exchange, where a
    window count flags duplicates.  Span strings assemble from 7 LEAD()s
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
    # ONE pass (round 12, guide §2.4 "two operations keyed the same way
    # share one exchange"): the historical groupBy+join-back computed the
    # span window pipeline TWICE (once under the fingerprint aggregate,
    # once for the join probe) and shuffled it twice. A count over a
    # fingerprint-partitioned window is the same number per row with one
    # spans computation and one exchange; the window's partition is an
    # occurrence group (tiny by construction — it is the dup count
    # itself). Output identical (exceptAll 0 both ways; oracle re-green
    # ×3 scales). Same-session A/B at sf0.1: 1.22 → 0.68 s.
    occ = F.count(F.lit(1)).over(Window.partitionBy("fp"))
    return (
        spans.withColumn("occurrences", occ.cast("long"))
        .where(F.col("occurrences") > 1)
        .select("doc_id", "pos", "fp", "occurrences")
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

    Scale note (round 9): the global reference ladder is an exact
    range-partitioned global rank (operators/rank.py), and the
    percentile lookup is a shuffle equi-join on the rank — both sides
    corpus-sized, neither broadcast, no unpartitioned window anywhere.
    (An approx_percentile knot grid remains a cheaper lossy alternative,
    but the exact form is itself scale-shaped now.)
    """
    from batch_processing_pipeline_spark.functions.text_analysis import (
        quality_score,
    )

    d = _t(spark, sf, "documents").where(
        F.length(F.lower(F.trim(F.col("text")))) > 0
    )
    # scored feeds THREE runtime consumers — the global-rank pin (a job
    # at build time), scored.count(), and the per-language window branch
    # of the final action — and without a persist each one re-scans the
    # text and re-evaluates quality_score (round-12 fourth session,
    # measured 0.65× with the cache; the count becomes a cache count
    # instead of a text scan). Narrow rows (id, lang, double); the cache
    # backs the returned frame, so it is released by the ContextCleaner
    # when the caller drops it (the pq_topk precedent). Deriving n from
    # the pin's max(rn) instead was measured SLOWER than the cache count
    # (2.11 vs 1.50 s) — an aggregate job over checkpoint storage costs
    # more than counting a hot cache.
    scored = d.select(
        "doc_id", "lang", quality_score(F.col("text")).alias("score")
    ).persist()
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
    from batch_processing_pipeline_spark.operators.rank import exact_global_rank

    glob = exact_global_rank(
        scored.select(F.col("score").alias("gscore"), "doc_id"),
        [F.col("gscore").asc(), F.col("doc_id").asc()],
        out_col="rn",
    ).select("gscore", "rn")
    n = scored.count()
    target = ranked.withColumn(
        "target_rn", (F.floor(F.col("pr") * (n - 1)) + 1).cast("bigint")
    )
    return (
        target.join(glob, F.col("target_rn") == F.col("rn"))
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

    Scale shape: first-occurrence is one min-over-window on the
    fingerprint-partitioned gram relation — only 16-byte fingerprints
    shuffle, never n-gram text; the per-doc score is a ratio aggregate.
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
    # ONE pass (round 12, same rewrite as dup_spans): first-occurrence is
    # a MIN over a fingerprint-partitioned window instead of a groupBy +
    # join-back — the historical form computed the gram pipeline
    # (explode + per-doc window + distinct) twice and shuffled it twice.
    # Output identical (exceptAll 0 both ways; oracle re-green ×3
    # scales). Same-session A/B at sf0.1: 1.14 → 0.91 s (an eager
    # checkpoint of `gram` instead measured WORSE, 1.45 s — the
    # serialized materialization outweighed the saved recompute).
    first_w = F.min("doc_id").over(Window.partitionBy("fp"))
    return (
        gram.withColumn("first_doc", first_w)
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


