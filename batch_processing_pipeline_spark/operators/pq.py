"""Product quantization (PQ) approximate nearest neighbor search
(Jégou, Douze, Schmid — "Product Quantization for Nearest Neighbor
Search", TPAMI 2011).

The fourth ANN path beside brute-force cosine, sign-LSH, and IVF
(operators/similarity.py, operators/ivf.py), and the one that attacks a
different axis: MEMORY.  The vector is split into ``m`` subvectors; each
subspace gets its own tiny k-means codebook (``ksub`` centroids); a corpus
vector is stored as ``m`` one-byte codes instead of ``dim`` floats — a
64-dim float32 vector compresses 32x at m=8/ksub=16.  At query time the
query is NOT quantized (asymmetric distance computation, ADC): per
subspace we precompute the distance from the query's subvector to each of
the ``ksub`` centroids (an m x ksub lookup table), and a corpus vector's
approximate distance is just the sum of m table lookups — no float vector
is ever touched during scan.

Scale shape: codebooks are trained on a sample (standard) and broadcast
as literals; encoding is one map-side pass producing a byte-sized code
column that rides with the table (the compressed index IS a column); each
query's lookup table is an m x ksub literal, so scoring is whole-stage
codegen over codes only.  An optional exact re-rank over the top
``refine`` candidates restores precision where it matters — the classic
ADC + re-rank pipeline.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from batch_processing_pipeline_spark.functions.vector import cosine_similarity, l2_norm
from batch_processing_pipeline_spark.operators.topk import top_k_per_group


def _unit(vec):
    """L2-normalize: on unit vectors, L2 distance is monotone in cosine
    (||a-b||^2 = 2 - 2cos), so ADC's L2 ranking matches the cosine ground
    truth the other ANN paths use.  The norm is floored (mirroring the
    training path's np.maximum(norm, 1e-12)) so an all-zero vector yields
    zeros, not NULLs — Spark's x/0.0 is NULL and NULLs would poison every
    downstream distance and rank."""
    n = F.greatest(l2_norm(vec), F.lit(1e-12))
    return F.transform(vec, lambda x: x.cast("double") / n)


def train_pq_codebooks(
    corpus: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    ksub: int = 16,
    seed: int = 42,
    max_train: int = 4096,
    iters: int = 20,
) -> list[list[list[float]]]:
    """Per-subspace k-means codebooks: ``m`` books of ``ksub`` centroids.

    Trained driver-side on a bounded, deterministically-chosen sample
    (md5-ordered ``max_train`` rows) with seeded Lloyd iterations — the
    faiss convention: PQ codebooks are tiny (m*ksub*sub floats) and
    training on an in-memory sample is standard; the DISTRIBUTED work is
    encoding and scanning, not training.  One collect of at most
    ``max_train`` vectors, zero per-subspace Spark jobs (an
    ml.KMeans-per-subspace variant cost m sequential fits — 70s at m=16
    on the sf0.01 fixture vs <1s for this).
    """
    X = collect_vectors(
        md5_ordered_sample(corpus, "pqtrain:", vec_col, max_train), "v"
    )
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    return subspace_codebooks(X, m=m, ksub=ksub, seed=seed, iters=iters)


def md5_ordered_sample(
    corpus: DataFrame, salt: str, vec_col: str, max_train: int
) -> DataFrame:
    """The deterministic ``max_train``-row training sample: rows with the
    smallest ``md5(salt || vector-as-string)``, in that order, projected
    to one ``v`` column.

    The key is MATERIALIZED into a column before the orderBy (round-12
    optimization): ``orderBy(<expr>).limit(k)`` plans TakeOrderedAndProject,
    whose priority-queue comparator RE-EVALUATES the ordering expression on
    every comparison — for this key that is an array→string render plus an
    md5 per compare, measured 0.83 s vs 0.14 s for the identical sample at
    bench scale (6×). Selected rows and their order are unchanged (asserted
    directly when the rewrite landed)."""
    key = F.md5(F.concat(F.lit(salt), F.col(vec_col).cast("string")))
    return (
        corpus.select(key.alias("__k"), F.col(vec_col).alias("v"))
        .orderBy("__k")
        .limit(max_train)
        .select("v")
    )


def collect_vectors(df: DataFrame, vec_col: str) -> "np.ndarray":
    """Bounded driver pull of a vector column as a float64 matrix, via
    Arrow (``toPandas``) instead of pickled rows — round-12 optimization:
    the row path deserialized each element through Python object floats
    (~1 s per training collect at bench scale vs ~0.1 s through Arrow).
    Values are identical: the stored float32s widen exactly to float64
    on either path, and row order is preserved."""
    s = df.toPandas()[vec_col]
    return np.asarray([np.asarray(v, dtype=np.float64) for v in s])


def subspace_codebooks(
    X: "np.ndarray", m: int, ksub: int, seed: int, iters: int = 20
) -> list[list[list[float]]]:
    """Seeded per-subspace Lloyd k-means over an in-memory training matrix.

    Shared by the raw-vector path above and the IVF-residual path
    (operators/ivfpq.py), which train on different matrices but need the
    identical deterministic procedure.
    """
    dim = X.shape[1]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    books = []
    for j in range(m):
        D = X[:, j * sub : (j + 1) * sub]
        rng = np.random.RandomState(seed + j)
        C = D[rng.choice(len(D), ksub, replace=False)].copy()
        for _ in range(iters):
            assign = ((D[:, None, :] - C[None]) ** 2).sum(-1).argmin(1)
            for c in range(ksub):
                members = D[assign == c]
                if len(members):
                    C[c] = members.mean(0)
        books.append([[float(x) for x in c] for c in C])
    return books


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    out_col: str = "pq_code",
) -> DataFrame:
    """Attach the m-byte PQ code: per subspace, the nearest centroid id.

    One map-side pass through an Arrow-batched pandas UDF: the codebook
    ships once per executor in the closure (m*ksub*sub floats — KBs) and
    each batch encodes as three numpy broadcasts per subspace
    ((X-C)² sum + argmin).  This is the documented escape hatch for
    math-dense kernels: the pure-codegen form (static per-centroid
    ``(element_at - const)²`` sums + array_sort argmin) builds an
    expression tree of ~m·ksub·sub·3 nodes, which at m=16/ksub=16 blows
    past the JVM codegen budget and falls back to interpreted evaluation
    — measured 10.6 s for 2,000 rows vs ~0.3 s for this kernel.  Ties
    (equidistant centroids) break to the LOWEST centroid id in both this
    and the training path (np.argmin takes the first minimum), keeping
    encode deterministic.
    """
    from pyspark.sql.functions import pandas_udf

    m = len(codebooks)
    sub = len(codebooks[0][0])
    books = [np.asarray(b, dtype=np.float64) for b in codebooks]

    @pandas_udf("array<int>")
    def enc(vecs: pd.Series) -> pd.Series:
        X = np.asarray(list(vecs), dtype=np.float64)
        X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        codes = np.empty((len(X), m), dtype=np.int32)
        for j in range(m):
            D = X[:, j * sub : (j + 1) * sub]
            # (n, ksub) squared distances via ||d||² - 2 d·c + ||c||²
            d2 = (
                (D * D).sum(1, keepdims=True)
                - 2.0 * (D @ books[j].T)
                + (books[j] * books[j]).sum(1)[None, :]
            )
            codes[:, j] = d2.argmin(1)
        return pd.Series(list(codes))

    return df.withColumn(out_col, enc(F.col(vec_col)))


def pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 10,
    refine: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k, fully relational: the per-query distance TABLE (m x ksub
    rows per query) is a small broadcast relation, corpus codes melt to
    (vec_id, j, code) rows, and the approximate distance is an equi-join
    on (j, code) + a partial-agg SUM — every operator whole-stage codegen.
    (A higher-order-function fold over the code array was tried first:
    HOFs evaluate interpreted per row, 20x slower on the scoring join.)

    ``refine``: if set, take the top ``refine`` ADC candidates per query and
    re-rank them by exact cosine (the standard precision-restoring tail).
    Output: (query_id, vec_id, rank [, cosine]) — deterministic tie-break
    on (distance, vec_id).
    """
    spark = queries.sparkSession
    m = len(codebooks)
    ksub = len(codebooks[0])
    sub = len(codebooks[0][0])

    book_df = spark.createDataFrame(
        [
            (j, c, [float(x) for x in codebooks[j][c]])
            for j in range(m)
            for c in range(ksub)
        ],
        "j int, c int, cent array<double>",
    )

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    qsub = q.withColumn("qunit", _unit(F.col("qvec"))).select(
        "query_id",
        F.posexplode(
            F.array(*[F.slice("qunit", j * sub + 1, sub) for j in range(m)])
        ).alias("j", "qs"),
    )
    # static per-dimension sum: plain codegen arithmetic, no HOF fold
    dist = sum(
        (
            (F.element_at("qs", i + 1) - F.element_at("cent", i + 1))
            * (F.element_at("qs", i + 1) - F.element_at("cent", i + 1))
            for i in range(sub)
        ),
        F.lit(0.0),
    )
    dtab = qsub.join(F.broadcast(book_df), "j").select(
        "query_id", "j", F.col("c").alias("code"), dist.alias("d")
    )

    # Materialize the code column before exploding: the index build IS a
    # separate pass in any real PQ deployment (codes are stored with the
    # table), and without the barrier Catalyst collapses the full encode
    # expression into the Generate operator, re-evaluating it per output
    # row (observed: 70 s for 500 rows vs ~2 s with the barrier).
    # localCheckpoint (not persist): the materialized codes are released
    # by the ContextCleaner when the returned DataFrame is dropped —
    # persist() would pin one cached corpus per call in the CacheManager
    # for the session lifetime with no safe place to unpersist (the
    # return value is lazy).
    encoded = (
        pq_encode(corpus, codebooks, vec_col=vec_col)
        .select(F.col(id_col).alias("vec_id"), "pq_code")
        .localCheckpoint(eager=True)
    )
    codes = encoded.select(
        "vec_id", F.posexplode("pq_code").alias("j", "code")
    )
    adc = (
        codes.join(F.broadcast(dtab), ["j", "code"])
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d").alias("adc"))
    )
    ranked = top_k_per_group(
        adc,
        ["query_id"],
        order_by=[F.col("adc").asc(), F.col("vec_id").asc()],
        k=k if refine is None else refine,
    )
    if refine is None:
        return ranked.select("query_id", "vec_id", F.col("rk").alias("rank"))
    cvecs = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cvec")
    )
    exact = (
        ranked.select("query_id", "vec_id")
        .join(q, "query_id")
        .join(cvecs, "vec_id")
        .select(
            "query_id",
            "vec_id",
            cosine_similarity(F.col("qvec"), F.col("cvec")).alias("cosine"),
        )
    )
    return top_k_per_group(
        exact,
        ["query_id"],
        order_by=[F.col("cosine").desc(), F.col("vec_id").asc()],
        k=k,
    ).select("query_id", "vec_id", F.col("rk").alias("rank"), "cosine")
