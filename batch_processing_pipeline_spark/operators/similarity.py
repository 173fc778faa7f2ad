"""Similarity search over embedding columns (``array<float>``).

Two paths:

* ``cosine_topk`` — brute-force exact top-k: broadcast the (small) query set
  against the corpus, dot product as a JVM column expression. O(|Q|·|C|·d)
  but embarrassingly parallel and shuffle-free until the final per-query
  top-k (which Spark plans as a WindowGroupLimit two-phase top-k).
* ``signlsh_topk`` — sign-random-projection LSH: hash every vector to a
  b-bit bucket with deterministic pseudo-random hyperplanes, then search
  only bucket-colliding pairs (multi-probe over Hamming-1 neighbors to
  recover recall). The scale path: candidate generation is an equi-join on
  bucket ids.

An IVF variant (k-means coarse quantizer via pyspark.ml) is a natural third
path; sign-LSH was chosen first because it is deterministic and
dependency-free.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from batch_processing_pipeline_spark.functions.rounding import round4
from batch_processing_pipeline_spark.functions.vector import cosine_similarity, dot_product
from batch_processing_pipeline_spark.operators.topk import top_k_per_group


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    Output: (query_id, rk, neighbor_id, cosine). Queries are broadcast —
    the corpus is scanned once, map-side, regardless of cluster size.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    pairs = F.broadcast(q).crossJoin(c)
    if exclude_self:
        pairs = pairs.where(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        round4(cosine_similarity(F.col("q_vec"), F.col("c_vec"))).alias("cosine"),
    )
    return top_k_per_group(
        scored,
        group_cols=["query_id"],
        order_by=[F.desc("cosine"), F.asc("neighbor_id")],
        k=k,
    ).select("query_id", "rk", "neighbor_id", "cosine")


def _coeff_matrix(n_planes: int, dim: int, seed: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplane coefficients in [-1, 1].

    md5-derived so the planes are identical across runs/machines without any
    runtime randomness (workflow/restart safe).
    """
    import hashlib

    matrix = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = int.from_bytes(
                hashlib.md5(f"{seed}:{p}:{d}".encode()).digest()[:8], "big"
            )
            row.append((h % 20001 - 10000) / 10000.0)
        matrix.append(row)
    return matrix


def signlsh_bucket(vec: Column, dim: int, n_planes: int = 12, seed: int = 7) -> Column:
    """b-bit sign-LSH bucket id of a vector.

    The coefficient matrix is a single array<array<double>> literal and the
    bucket is a fold over planes (nested HOFs) — generated code stays small
    regardless of dim × planes, unlike inlining dim·planes multiply terms.
    """
    coefs = F.lit(_coeff_matrix(n_planes, dim, seed))

    def plane_term(acc: Column, p: Column) -> Column:
        row = F.element_at(coefs, (p + F.lit(1)).cast("int"))
        proj = F.aggregate(
            F.zip_with(vec, row, lambda x, c: x.cast("double") * c),
            F.lit(0.0),
            lambda a, v: a + v,
        )
        return acc + F.when(proj > 0, F.pow(F.lit(2.0), p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )

    return F.aggregate(
        F.sequence(F.lit(0), F.lit(n_planes - 1)), F.lit(0).cast("long"), plane_term
    )


def signlsh_buckets(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_planes: int,
    n_tables: int,
    seed: int,
    carry_vec: bool = False,
) -> DataFrame:
    """(id, table_id, bucket) for every vector — one map-side Arrow pass.

    Round-12 optimization (guide §4.2, the ``ivfpq_encode`` precedent):
    the historical "codegen bulk" form exploded every vector to
    (id, pos, v) rows, joined a broadcast (table, plane, pos, coef)
    relation — a ×(dim·planes·tables) row blow-up, 3072 rows per 64-dim
    vector — and rebuilt buckets through TWO hash-aggregation shuffles.
    Measured at bench scale: 1.26 s for 2000 vectors, ~2/3 of the whole
    signlsh_topk row; at corpus scale it re-shuffles the corpus twice for
    a value that is a pure function of the row. Here all ``n_tables``
    buckets are computed in one Arrow-batched matmul per batch
    (X @ coefᵀ → sign bits → bucket ints) with the coefficient matrix
    riding the closure (KBs), then ``posexplode`` fans out the
    (table_id, bucket) rows map-side. No shuffle, no join, no
    aggregation state. FP note: the matmul associates additions
    differently from the old per-element aggregate — a sign could in
    principle flip for a projection within ~1e-15 of zero; recall
    bounds, planted-pair behavior, and the full differential pass are
    re-asserted on the new kernel.
    """
    from pyspark.sql.functions import pandas_udf

    spark = df.sparkSession
    # The bucket pass is CPU-bound; compacted inputs (few parquet row
    # groups) would serialize it on a handful of tasks — spread it when
    # the source has fewer partitions than cores (no-op at real scale).
    if df.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism:
        df = df.repartition(spark.sparkContext.defaultParallelism)
    # (dim, tables·planes) coefficient matrix; column t·n_planes+p is
    # table t's plane p — identical planes to the historical form.
    coef = np.asarray(
        [
            row
            for t in range(n_tables)
            for row in _coeff_matrix(n_planes, dim, seed + 1000 * t)
        ],
        dtype=np.float64,
    ).T
    powers = np.asarray([1 << p for p in range(n_planes)], dtype=np.int64)

    @pandas_udf("array<long>")
    def all_buckets(vecs: pd.Series) -> pd.Series:
        n = len(vecs)
        if n == 0:
            return pd.Series([], dtype=object)
        X = np.zeros((n, dim), dtype=np.float64)
        for i, v in enumerate(vecs):
            a = np.asarray(v, dtype=np.float64)[:dim]
            X[i, : len(a)] = a
        bits = (X @ coef) > 0  # (batch, tables·planes)
        b = bits.reshape(n, n_tables, n_planes) @ powers  # (batch, tables)
        return pd.Series(list(b))

    # zero-pad/truncate to ``dim`` inside the kernel = the historical
    # partial-dot semantics for ragged vectors (absent positions
    # contributed nothing to the projection); empty/NULL vectors emitted
    # no bucket rows in the explode form, so they are filtered here too.
    # ``carry_vec`` rides the vector column through the fan-out so a
    # caller that needs (bucket, vector) rows — the candidate join —
    # skips the historical join-back to the corpus (one fewer corpus
    # shuffle; the candidate join ships the vector either way).
    keep = [F.col(id_col)] + ([F.col(vec_col)] if carry_vec else [])
    return df.where(
        F.col(vec_col).isNotNull() & (F.size(F.col(vec_col)) > 0)
    ).select(
        *keep,
        F.posexplode(all_buckets(F.col(vec_col))).alias("table_id", "bucket"),
    )


def embedding_near_dup(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    use_lsh: bool = True,
    dim: int | None = None,
    n_planes: int = 6,
    n_tables: int = 8,
    seed: int = 7,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine ≥ threshold.

    ``use_lsh=True`` (the scale path): candidates are pairs colliding in
    any sign-LSH table, then exact cosine verification — O(collisions),
    not O(n²). ``use_lsh=False`` scores all pairs exactly (bounded scopes /
    oracle ground truth only). Output: (id_a, id_b, cosine), id_a < id_b.
    """
    base = df.select(F.col(id_col), F.col(vec_col))
    if use_lsh:
        if dim is None:
            raise ValueError("dim is required for the LSH path")
        b = signlsh_buckets(base, id_col, vec_col, dim, n_planes, n_tables, seed)
        # both sides of the band self-join branch from this relation;
        # materialize it eagerly or each branch recomputes the bucket pass
        # (same race as the minhash signature persist, operators/dedup.py)
        withv = b.join(base, id_col).persist()
        withv.count()
        a_side = withv.select(
            F.col(id_col).alias("id_a"),
            F.col(vec_col).alias("va"),
            "table_id",
            "bucket",
        )
        b_side = withv.select(
            F.col(id_col).alias("id_b"),
            F.col(vec_col).alias("vb"),
            "table_id",
            "bucket",
        )
        pairs = (
            a_side.join(b_side, ["table_id", "bucket"])
            .where(F.col("id_a") < F.col("id_b"))
            .dropDuplicates(["id_a", "id_b"])
            # withv has served both sides of the self-join once the pair
            # set materializes; release it rather than leaking the cache
            # into long-lived sessions. The deduped pair relation is
            # recomputable from lineage if evicted.
            .localCheckpoint(eager=True)
        )
        withv.unpersist()
    else:
        a_side = base.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
        b_side = base.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
        pairs = a_side.join(b_side, F.col("id_a") < F.col("id_b"))
    return (
        pairs.select(
            "id_a",
            "id_b",
            round4(cosine_similarity(F.col("va"), F.col("vb"))).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def signlsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 6,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
    multiprobe: int = 0,
) -> DataFrame:
    """Approximate top-k via multi-table sign-LSH (OR-construction).

    A pair is a candidate if it collides in ANY of ``n_tables`` independent
    b-bit hash tables — the classic AND(b planes)/OR(L tables) trade-off:
    larger ``n_planes`` prunes harder, more ``n_tables`` recovers recall.
    Candidate generation is an equi-join on (table_id, bucket); only
    candidates get exact cosine scoring. Recall vs the exact path is
    asserted in tests/test_similarity.py.

    ``multiprobe=m`` additionally probes every bucket within Hamming
    distance ``m`` of each query bucket (all combinations of up to ``m``
    flipped sign bits) — the standard multi-probe LSH recall lever: a near
    neighbor that lands JUST on the other side of one (or m) hyperplane(s)
    still collides. Expansion happens on the QUERY side only, which is
    broadcast — the corpus relation, the big side at 100 TB, is never
    expanded or reshuffled; candidate volume grows by at most
    sum(C(n_planes, i) for i <= m)x before dedup while recall rises
    sharply (m=1 pinned >= 0.8 in tests/test_similarity.py).
    """
    c = signlsh_buckets(
        corpus, id_col, vec_col, dim, n_planes, n_tables, seed, carry_vec=True
    ).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        "table_id",
        "bucket",
    )
    qb = signlsh_buckets(
        queries, id_col, vec_col, dim, n_planes, n_tables, seed, carry_vec=True
    ).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        "table_id",
        "bucket",
    )
    if multiprobe:
        # probe set: the exact bucket plus every bucket within Hamming
        # distance `multiprobe` (bucket XOR mask for each flip mask of
        # popcount <= multiprobe). Query-side only — stays broadcast.
        from itertools import combinations

        masks = [
            sum(1 << p for p in combo)
            for depth in range(1, min(multiprobe, n_planes) + 1)
            for combo in combinations(range(n_planes), depth)
        ]
        probes = F.array(
            F.col("bucket"),
            *[
                F.col("bucket").bitwiseXOR(F.lit(mask).cast("long"))
                for mask in masks
            ],
        )
        qb = qb.select(
            "query_id", "q_vec", "table_id",
            F.explode(probes).alias("bucket"),
        )
    scored = (
        F.broadcast(qb)
        .join(c, ["table_id", "bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "q_vec", "neighbor_id", "c_vec")
        .dropDuplicates(["query_id", "neighbor_id"])
        .select(
            "query_id",
            "neighbor_id",
            round4(cosine_similarity(F.col("q_vec"), F.col("c_vec"))).alias(
                "cosine"
            ),
        )
    )
    return top_k_per_group(
        scored,
        group_cols=["query_id"],
        order_by=[F.desc("cosine"), F.asc("neighbor_id")],
        k=k,
    ).select("query_id", "rk", "neighbor_id", "cosine")
