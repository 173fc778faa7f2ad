"""IVF-PQ (IVFADC) approximate nearest neighbor search — the composition
of the coarse quantizer (operators/ivf.py) and product quantization
(operators/pq.py), after Jégou/Douze/Schmid, "Product Quantization for
Nearest Neighbor Search" (TPAMI 2011, §IV: IVFADC).

Why compose: IVF prunes WHICH vectors are scanned (nprobe/k_coarse of the
corpus), PQ compresses HOW each scanned vector is represented (m one-byte
codes instead of dim floats). Production ANN at 100 TB runs both — the
inverted lists hold PQ codes of the RESIDUAL (vector minus its cell
centroid), which quantizes a much tighter distribution than raw vectors,
so the same code budget buys more precision.

Scale shape:

* coarse centroids + residual codebooks are tiny (k_coarse·dim +
  m·ksub·(dim/m) floats) — trained on bounded samples, shipped to
  executors as literals/closures; zero per-row Python besides the
  Arrow-batched encode kernel (the documented escape hatch for
  math-dense kernels, see pq.pq_encode);
* the corpus index is ONE map-side pass producing (vec_id, cell, m
  codes) — the compressed inverted file IS a column, storable next to
  the table, bucketed by cell;
* a query's ADC tables are built ONLY for its ``nprobe`` probed cells
  (per-cell residual q - c changes the table, so there are
  nprobe × m × ksub rows per query — KBs, broadcast);
* the scan is an equi-join on (cell, j, code): cell pruning happens IN
  the join key — unprobed cells never produce join matches, so the
  scanned fraction is ~nprobe/k_coarse of the corpus, each row m byte
  codes, and the distance is a map-side-combining SUM. Every operator
  whole-stage codegen;
* exact re-rank of the top ``refine`` ADC candidates restores precision
  (classic IVFADC + refine tail), touching float vectors only for
  refine × n_queries rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from batch_processing_pipeline_spark.fsutil import glob_exists as fs_glob_exists
from batch_processing_pipeline_spark.fsutil import hadoop_fs
from batch_processing_pipeline_spark.fsutil import read_text as fs_read_text
from batch_processing_pipeline_spark.fsutil import write_text as fs_write_text
from batch_processing_pipeline_spark.functions.vector import cosine_similarity
from batch_processing_pipeline_spark.operators.pq import (
    collect_vectors,
    md5_ordered_sample,
    subspace_codebooks,
)
from batch_processing_pipeline_spark.operators.topk import top_k_per_group


def train_ivfpq(
    corpus: DataFrame,
    vec_col: str = "embedding",
    k_coarse: int = 8,
    m: int = 8,
    ksub: int = 16,
    seed: int = 42,
    max_train: int = 4096,
    iters: int = 20,
) -> tuple[list[list[float]], list[list[list[float]]]]:
    """(coarse centroids, residual codebooks) from one bounded sample.

    One collect of ≤ ``max_train`` md5-ordered unit vectors (the
    train_pq_codebooks convention: deterministic sample, driver-side
    Lloyd — codebook training is tiny; the DISTRIBUTED work is encoding
    and scanning). Coarse k-means runs on unit vectors so cells partition
    the cosine geometry; residuals (x - centroid[cell]) feed the
    subspace codebooks — the IVFADC arrangement.
    """
    X = collect_vectors(
        md5_ordered_sample(corpus, "ivfpqtrain:", vec_col, max_train), "v"
    )
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    C = X[rng.choice(len(X), k_coarse, replace=False)].copy()
    for _ in range(iters):
        assign = ((X[:, None, :] - C[None]) ** 2).sum(-1).argmin(1)
        for c in range(k_coarse):
            members = X[assign == c]
            if len(members):
                C[c] = members.mean(0)
    assign = ((X[:, None, :] - C[None]) ** 2).sum(-1).argmin(1)
    residuals = X - C[assign]
    books = subspace_codebooks(residuals, m=m, ksub=ksub, seed=seed, iters=iters)
    centroids = [[float(x) for x in c] for c in C]
    return centroids, books


def _books_tensor(
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    cell_codebooks: dict[int, list[list[list[float]]]] | None,
) -> "np.ndarray | None":
    """(k_coarse, m, ksub, sub) codebook tensor when any cell carries
    LOCAL books (``refresh_ivfpq_index``), else None (global-books fast
    path). Tiny either way: 8×16×16×4 doubles ≈ 64 KB in the closure."""
    if not cell_codebooks:
        return None
    base = np.asarray(codebooks, dtype=np.float64)
    B = np.repeat(base[None, :, :, :], len(centroids), axis=0).copy()
    for cell, books in cell_codebooks.items():
        B[int(cell)] = np.asarray(books, dtype=np.float64)
    return B


def ivfpq_encode(
    df: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    with_res_norm: bool = False,
    cell_codebooks: dict[int, list[list[list[float]]]] | None = None,
) -> DataFrame:
    """The inverted file: (id, cell, pq_code) — one map-side Arrow pass.

    Per batch: unit-normalize, nearest coarse cell (argmin, ties to the
    lowest cell id), residual against that cell's centroid, per-subspace
    nearest codeword. Centroid matrix + codebooks ride the closure (KBs
    per executor).

    ``with_res_norm=True`` additionally emits the residual's L2 norm as
    ``res_norm`` from the SAME kernel pass — the index save/append paths
    use it so the drift baseline/audit never re-runs cell assignment over
    the corpus (a second full Arrow pass saved).

    ``cell_codebooks``: per-cell residual codebook OVERRIDES (from a
    drift-triggered ``refresh_ivfpq_index``) — rows landing in an
    overridden cell are coded against that cell's local books, everything
    else against the frozen global books; the kernel stays one Arrow
    pass (a per-present-cell vectorized sub-loop replaces the flat
    subspace loop only when overrides exist)."""
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64)
    m = len(codebooks)
    sub = len(codebooks[0][0])
    books = [np.asarray(b, dtype=np.float64) for b in codebooks]
    B = _books_tensor(centroids, codebooks, cell_codebooks)

    @pandas_udf("struct<cell: int, pq_code: array<int>, res_norm: double>")
    def enc(vecs: pd.Series) -> pd.DataFrame:
        X = np.asarray(list(vecs), dtype=np.float64)
        X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        d2 = (
            (X * X).sum(1, keepdims=True) - 2.0 * (X @ C.T) + (C * C).sum(1)[None, :]
        )
        cells = d2.argmin(1)
        R = X - C[cells]
        codes = np.empty((len(X), m), dtype=np.int32)
        if B is None:
            for j in range(m):
                D = R[:, j * sub : (j + 1) * sub]
                dj = (
                    (D * D).sum(1, keepdims=True)
                    - 2.0 * (D @ books[j].T)
                    + (books[j] * books[j]).sum(1)[None, :]
                )
                codes[:, j] = dj.argmin(1)
        else:
            for cc in np.unique(cells):
                mask = cells == cc
                for j in range(m):
                    D = R[mask, j * sub : (j + 1) * sub]
                    bj = B[cc, j]
                    dj = (
                        (D * D).sum(1, keepdims=True)
                        - 2.0 * (D @ bj.T)
                        + (bj * bj).sum(1)[None, :]
                    )
                    codes[mask, j] = dj.argmin(1)
        return pd.DataFrame(
            {
                "cell": cells.astype("int32"),
                "pq_code": list(codes),
                "res_norm": np.linalg.norm(R, axis=1),
            }
        )

    out_cols = [
        id_col,
        F.col("_e.cell").alias("cell"),
        F.col("_e.pq_code").alias("pq_code"),
    ]
    if with_res_norm:
        out_cols.append(F.col("_e.res_norm").alias("res_norm"))
    return df.select(F.col(id_col), enc(F.col(vec_col)).alias("_e")).select(
        *out_cols
    )


def ivfpq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    k: int = 10,
    nprobe: int = 4,
    refine: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    encoded: DataFrame | None = None,
    prune_scan: bool = False,
    cell_codebooks: dict[int, list[list[list[float]]]] | None = None,
) -> DataFrame:
    """IVFADC top-k: per-(query, probed-cell) residual ADC tables joined
    against the cell-pruned code relation, optional exact re-rank.

    Output: (query_id, vec_id, rank [, cosine]); deterministic tie-break
    on (distance, vec_id). L2-over-unit-vectors is monotone in cosine, so
    ranks are comparable with the other ANN paths' cosine ground truth.

    ``encoded``: a prebuilt (id, cell, pq_code) inverted file (e.g. from
    ``load_ivfpq_index``) — skips the per-call encode pass, the
    production shape (the index is built once per corpus version, not
    per query batch). ``prune_scan=True`` additionally filters the code
    relation to the union of all probed cells BEFORE the join: the set
    is bounded by k_coarse (one tiny collect), and on a cell-partitioned
    stored index the filter becomes parquet PARTITION PRUNING — unprobed
    cell directories are never read at all.

    ``cell_codebooks``: per-cell overrides from ``refresh_ivfpq_index``
    (``load_ivfpq_model``'s ``cell_codebooks``). The ADC tables then key
    codewords by (cell, j, code) — the book relation grows to
    k_coarse × m × ksub rows, still a KB-scale broadcast — so a probe
    into a refreshed cell scores against that cell's local books, which
    MUST match the books its stored codes were written with.
    """
    spark = queries.sparkSession
    C = np.asarray(centroids, dtype=np.float64)
    k_coarse = len(centroids)
    m = len(codebooks)
    ksub = len(codebooks[0])
    sub = len(codebooks[0][0])

    # ---- query side: nprobe cells + per-cell residual subvectors, all
    # driver-free. The probed-cell assignment reuses the encode kernel's
    # math but keeps the nprobe nearest cells; emitted as one row per
    # (query, probe) with the residual, then exploded to subspaces.
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<struct<cell: int, res: array<double>>>")
    def probes(vecs: pd.Series) -> pd.Series:
        X = np.asarray(list(vecs), dtype=np.float64)
        X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        d2 = (
            (X * X).sum(1, keepdims=True) - 2.0 * (X @ C.T) + (C * C).sum(1)[None, :]
        )
        # stable argsort → deterministic probe order; ties to lower cell id
        order = np.argsort(d2, axis=1, kind="stable")[:, :nprobe]
        out = []
        for i in range(len(X)):
            out.append(
                [
                    {"cell": int(c), "res": list(X[i] - C[c])}
                    for c in order[i]
                ]
            )
        return pd.Series(out)

    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    qprobe = q.select(
        "query_id", F.explode(probes(F.col("qvec"))).alias("p")
    ).select(
        "query_id",
        F.col("p.cell").alias("cell"),
        F.posexplode(
            F.array(*[F.slice("p.res", j * sub + 1, sub) for j in range(m)])
        ).alias("j", "qs"),
    )
    if prune_scan:
        # materialize the probe relation ONCE: both the probed-cell
        # collect below and the ADC join read qprobe, and without the
        # barrier each consumer re-runs the probes kernel over all
        # queries (nprobe*m rows/query — small; the kernel pass is the
        # cost being deduplicated)
        qprobe = qprobe.localCheckpoint(eager=True)

    dist = sum(
        (
            (F.element_at("qs", i + 1) - F.element_at("cent", i + 1))
            * (F.element_at("qs", i + 1) - F.element_at("cent", i + 1))
            for i in range(sub)
        ),
        F.lit(0.0),
    )
    if cell_codebooks:
        by_cell = {
            int(cc): books for cc, books in cell_codebooks.items()
        }
        book_df = spark.createDataFrame(
            [
                (
                    cell,
                    j,
                    c,
                    [float(x) for x in by_cell.get(cell, codebooks)[j][c]],
                )
                for cell in range(k_coarse)
                for j in range(m)
                for c in range(ksub)
            ],
            "cell int, j int, c int, cent array<double>",
        )
        dtab = qprobe.join(F.broadcast(book_df), ["cell", "j"]).select(
            "query_id", "cell", "j", F.col("c").alias("code"), dist.alias("d")
        )
    else:
        book_df = spark.createDataFrame(
            [
                (j, c, [float(x) for x in codebooks[j][c]])
                for j in range(m)
                for c in range(ksub)
            ],
            "j int, c int, cent array<double>",
        )
        dtab = qprobe.join(F.broadcast(book_df), "j").select(
            "query_id", "cell", "j", F.col("c").alias("code"), dist.alias("d")
        )

    # ---- corpus side: the inverted file, materialized once (same
    # barrier rationale as pq_topk: without it the encode expression is
    # re-evaluated per generated row). A caller-supplied index (already
    # on disk / materialized) is used as-is.
    if encoded is None:
        encoded = ivfpq_encode(
            corpus,
            centroids,
            codebooks,
            id_col=id_col,
            vec_col=vec_col,
            cell_codebooks=cell_codebooks,
        ).localCheckpoint(eager=True)
    codes = encoded.select(
        F.col(id_col).alias("vec_id"), "cell", F.posexplode("pq_code").alias("j", "code")
    )
    if prune_scan:
        # distinct probed cells off the materialized qprobe (one tiny
        # scan of the checkpoint, no re-run of the probes kernel)
        probed = [
            r.cell for r in qprobe.select("cell").distinct().collect()
        ]  # bounded by k_coarse
        codes = codes.where(F.col("cell").isin(probed))

    # cell pruning IS the join: rows in unprobed cells meet no dtab row.
    # Self-matches drop (the cosine_topk / ivf_topk convention).
    adc = (
        codes.join(F.broadcast(dtab), ["cell", "j", "code"])
        .where(F.col("query_id") != F.col("vec_id"))
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
    cvecs = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cvec"))
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


def residual_stats(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-cell residual-magnitude profile: (cell, n, mean_res_norm).

    ``mean_res_norm`` is the average L2 norm of the IVF residual
    (unit-normalized vector minus its nearest coarse centroid) — the
    quantity the residual codebooks were trained to quantize. When new
    data drifts away from the training distribution, residuals grow and
    PQ precision decays; this relation is the audit that detects it.
    One Arrow map pass + a k_coarse-row aggregate."""
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64)

    @pandas_udf("struct<cell: int, rn: double>")
    def cell_rn(vecs: pd.Series) -> pd.DataFrame:
        X = np.asarray(list(vecs), dtype=np.float64)
        X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        d2 = (
            (X * X).sum(1, keepdims=True) - 2.0 * (X @ C.T) + (C * C).sum(1)[None, :]
        )
        cells = d2.argmin(1)
        rn = np.linalg.norm(X - C[cells], axis=1)
        return pd.DataFrame({"cell": cells.astype("int32"), "rn": rn})

    return (
        df.select(cell_rn(F.col(vec_col)).alias("_r"))
        .select(F.col("_r.cell").alias("cell"), F.col("_r.rn").alias("rn"))
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("rn").alias("mean_res_norm"),
        )
    )


def append_to_ivfpq_index(
    new_vectors: DataFrame,
    path: str,
    refresh_id: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Corpus refresh WITHOUT re-training or re-encoding history: assign
    the new vectors to cells with the index's FROZEN centroids, encode
    them with the FROZEN residual codebooks, and write the code rows
    into the index as a ``refresh=<refresh_id>`` partition — identical
    rows to what a from-scratch ``save_ivfpq_index`` over (old + new)
    would have written for these ids (pinned in tests/test_ivfpq.py), at
    O(new) cost.

    ``refresh_id`` (>= 1; the base save owns 0) keys the batch: the write
    is a DYNAMIC partition overwrite of exactly the ``refresh=<id>``
    partitions, so an at-least-once orchestrator replaying the refresh
    overwrites its own earlier attempt instead of double-appending
    duplicate code rows (the streaming/dedup.py idempotency discipline).
    The residual norms ride the encode kernel itself (one Arrow pass,
    read back from the written batch partition with column pruning — no
    second cell-assignment pass).

    Returns the residual-drift audit: per cell, the appended batch's
    (n_new, mean_res_norm_new) against the baseline recorded at
    ``save_ivfpq_index`` time, with ``drift = new / baseline``. A drift
    ratio creeping past ~1.2–1.5 is the re-train signal: frozen codebooks
    are quantizing residuals they were not trained on, and recall decays
    silently otherwise — this completes the corpus-refresh story the
    dedup side already has (dedup_against_index / minhash_band_index).

    Legacy-layout guard: an index written by a pre-refresh
    ``save_ivfpq_index`` (codes partitioned by ``cell`` only, no
    ``res_norm_baseline`` in model.json) is REJECTED before anything is
    written. Appending ``refresh=N/cell=K`` directories next to bare
    ``cell=K`` ones would give the codes store two conflicting partition
    structures — the immediate read-back fails AND the mixed layout
    leaves the index permanently unreadable, which is strictly worse
    than failing fast with a migration instruction."""
    import json

    if int(refresh_id) < 1:
        raise ValueError("refresh_id must be >= 1 (0 is the base save)")
    spark = new_vectors.sparkSession
    model = json.loads(fs_read_text(spark, f"{path}/model.json"))
    if "res_norm_baseline" not in model or fs_glob_exists(
        spark, f"{path}/codes/cell=*"
    ):
        raise ValueError(
            "append_to_ivfpq_index: index at "
            f"{path!r} uses the legacy layout (codes partitioned by cell "
            "only / no res_norm_baseline in model.json); appending would "
            "mix refresh=*/cell=* with cell=* directories and make the "
            "codes store unreadable. Migrate first: re-run "
            "save_ivfpq_index over the indexed corpus (rewrites codes "
            "under refresh=0/cell=* and records the drift baseline)."
        )
    centroids, codebooks = model["centroids"], model["codebooks"]
    cell_books = {
        int(c): b for c, b in model.get("cell_codebooks", {}).items()
    }
    encoded = ivfpq_encode(
        new_vectors,
        centroids,
        codebooks,
        id_col=id_col,
        vec_col=vec_col,
        with_res_norm=True,
        # post-refresh indexes carry cell-local books: appended rows in a
        # refreshed cell must be coded against the SAME books as the
        # cell's stored codes or ADC distances stop being comparable
        cell_codebooks=cell_books or None,
    ).withColumn("refresh", F.lit(int(refresh_id)))
    (
        encoded.write.partitionBy("refresh", "cell")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .parquet(f"{path}/codes")
    )

    new_stats = (
        spark.read.parquet(f"{path}/codes")
        .where(F.col("refresh") == int(refresh_id))
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("res_norm").alias("mean_res_norm"),
        )
    )
    baseline_rows = [
        (int(c), float(v)) for c, v in model["res_norm_baseline"].items()
    ]
    baseline = spark.createDataFrame(
        baseline_rows, "cell int, mean_res_norm_baseline double"
    )
    return (
        new_stats.join(F.broadcast(baseline), "cell", "full_outer")
        .select(
            "cell",
            F.coalesce(F.col("n"), F.lit(0)).alias("n_new"),
            F.col("mean_res_norm").alias("mean_res_norm_new"),
            "mean_res_norm_baseline",
            (F.col("mean_res_norm") / F.col("mean_res_norm_baseline")).alias(
                "drift"
            ),
        )
    )


def save_ivfpq_index(
    corpus: DataFrame,
    path: str,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the IVFADC index: codes as parquet PARTITIONED BY cell
    (so a probe's cell filter becomes directory-level partition pruning
    — unprobed inverted lists are never read), plus the tiny model
    (centroids + codebooks) as JSON next to it. The compressed index IS
    a table: m bytes/vector + the partition column.

    model.json goes through the Hadoop FileSystem API, so the index can
    live on any filesystem the parquet half supports (HDFS, s3a, local),
    not just the driver's local disk.

    Alongside the model, the per-cell mean residual norm of the indexed
    corpus is recorded (``res_norm_baseline``) — the reference point
    ``append_to_ivfpq_index``'s drift audit compares refresh batches
    against. The norms ride the encode kernel (one Arrow pass over the
    corpus) and are stored per row, so the baseline aggregate reads back
    only the (cell, res_norm) columns of the just-written parquet.

    Codes are partitioned ``refresh=0/cell=K``: the ``refresh`` level is
    the batch key ``append_to_ivfpq_index`` overwrites idempotently; the
    ``cell`` level is what probe filters prune on (unchanged)."""
    import json

    spark = corpus.sparkSession
    encoded = ivfpq_encode(
        corpus,
        centroids,
        codebooks,
        id_col=id_col,
        vec_col=vec_col,
        with_res_norm=True,
    ).withColumn("refresh", F.lit(0))
    encoded.write.partitionBy("refresh", "cell").mode("overwrite").parquet(
        f"{path}/codes"
    )
    baseline = {
        str(r["cell"]): float(r["mean_res_norm"])
        for r in spark.read.parquet(f"{path}/codes")
        .groupBy("cell")
        .agg(F.avg("res_norm").alias("mean_res_norm"))
        .collect()
    }
    fs_write_text(
        spark,
        f"{path}/model.json",
        json.dumps(
            {
                "centroids": centroids,
                "codebooks": codebooks,
                "res_norm_baseline": baseline,
            }
        ),
    )


def delete_from_ivfpq_index(
    ids: DataFrame,
    path: str,
    id_col: str = "vec_id",
) -> dict:
    """Remove vectors from the stored IVFADC index — the third leg of the
    index lifecycle beside ``append_to_ivfpq_index`` (add) and
    ``refresh_ivfpq_index`` (repair): GDPR erasure / corpus retractions
    must not require a full index rebuild.

    ``ids``: a relation carrying ``id_col`` (broadcast onto the code
    scan — deletion sets are small relative to the corpus; a mass
    retraction big enough to break that assumption warrants a rebuild
    anyway). Shape: one partition-pruned pass finds the touched
    (refresh, cell) partitions (bounded by refreshes × k_coarse), the
    survivors of ONLY those partitions are rewritten via dynamic
    partition overwrite, and partitions left EMPTY are removed
    explicitly (dynamic overwrite cannot replace a partition with
    nothing). Cost: O(touched partitions), never O(index).

    Replay-safe: a second run of the same delete finds no matching ids,
    touches no partitions, and is a no-op. The drift baseline is
    deliberately NOT recomputed — it records the distribution the
    codebooks were trained on, which a deletion does not change.

    Returns ``{"deleted", "partitions_rewritten", "partitions_removed"}``.
    """
    spark = ids.sparkSession
    if not fs_glob_exists(spark, f"{path}/codes/refresh=*"):
        raise ValueError(
            "delete_from_ivfpq_index: index at "
            f"{path!r} has no refresh=* partitions (legacy layout or "
            "empty); re-run save_ivfpq_index first"
        )
    del_ids = ids.select(id_col).distinct()
    codes = spark.read.parquet(f"{path}/codes")
    hit = codes.join(F.broadcast(del_ids), id_col, "left_semi")
    touched = [
        (int(r["refresh"]), int(r["cell"]))
        for r in hit.select("refresh", "cell").distinct().collect()
    ]
    n_deleted = hit.count()
    if not touched:
        return {"deleted": 0, "partitions_rewritten": 0, "partitions_removed": 0}
    touched_pred = None
    for refresh, cell in touched:
        p = (F.col("refresh") == refresh) & (F.col("cell") == cell)
        touched_pred = p if touched_pred is None else (touched_pred | p)
    # materialize survivors before overwriting the path they came from
    survivors = (
        codes.where(touched_pred)
        .join(F.broadcast(del_ids), id_col, "left_anti")
        .localCheckpoint(eager=True)
    )
    kept = {
        (int(r["refresh"]), int(r["cell"]))
        for r in survivors.select("refresh", "cell").distinct().collect()
    }
    if kept:
        (
            survivors.write.partitionBy("refresh", "cell")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .parquet(f"{path}/codes")
        )
    emptied = [pc for pc in touched if pc not in kept]
    for refresh, cell in emptied:
        fs, hpath = hadoop_fs(
            spark, f"{path}/codes/refresh={refresh}/cell={cell}"
        )
        fs.delete(hpath, True)
    return {
        "deleted": int(n_deleted),
        "partitions_rewritten": len(kept),
        "partitions_removed": len(emptied),
    }


def compact_ivfpq_index(spark, path: str) -> dict:
    """Fold every ``refresh=N`` batch partition back into the base
    ``refresh=0`` layout — the fourth index-lifecycle leg (add / repair /
    remove / COMPACT): a long-lived index accretes one directory level
    per append batch, and probe-side partition listing plus small-file
    overhead grow with it even though the DATA volume doesn't.

    Shape: one read of the full code relation (compaction is inherently
    O(index) — that is its price everywhere), repartitioned by ``cell``
    so each cell directory lands in ~one file, written to a staging
    directory and atomically swapped in via Hadoop FS rename (works on
    file:/hdfs:; object stores emulate rename — same caveat as every
    rename-based committer).

    Ordering contract: run only when no append/refresh replays are in
    flight — folding ``refresh=N`` into 0 removes the partition a LATE
    replay of batch N would have overwritten, so such a replay would
    re-add its rows (the usual compaction-vs-late-writer rule; the
    orchestrator that owns refresh_ids owns this fence).

    Crash safety (round-11 advice fix): the swap is rename(codes ->
    codes__old), rename(staging -> codes), delete(codes__old) — at every
    instant a complete copy of the data is addressable under a stable
    name. A crash between the renames is self-healing: the next call
    (or ``load_ivfpq_index`` consumers re-running compact) finds
    ``codes__old`` without ``codes`` and renames the backup straight
    back before doing anything else. The previous delete-then-rename
    order left a crash window where the only copy lived in the staging
    directory.

    Returns ``{"rows", "refreshes_folded"}``.
    """
    codes_path = f"{path}/codes"
    backup_path = f"{path}/codes__backup"
    staging = f"{path}/codes__compacting"
    fs, old = hadoop_fs(spark, codes_path)
    _, bak = hadoop_fs(spark, backup_path)
    _, new = hadoop_fs(spark, staging)
    if fs.exists(bak):
        if fs.exists(old):
            # previous compaction completed its swap but died before
            # removing the backup — the live directory wins
            fs.delete(bak, True)
        elif not fs.rename(bak, old):
            raise IOError(
                f"compact_ivfpq_index: could not restore backup "
                f"{backup_path} -> {codes_path} after an interrupted swap"
            )
    codes = spark.read.parquet(codes_path)
    refreshes = [
        int(r["refresh"]) for r in codes.select("refresh").distinct().collect()
    ]
    n_rows = codes.count()
    (
        codes.withColumn("refresh", F.lit(0))
        .repartition("cell")
        .write.partitionBy("refresh", "cell")
        .mode("overwrite")
        .parquet(staging)
    )
    if not fs.rename(old, bak):
        raise IOError(
            f"compact_ivfpq_index: rename {codes_path} -> {backup_path} failed"
        )
    if not fs.rename(new, old):
        # put the original back before failing: the index stays readable
        fs.rename(bak, old)
        raise IOError(
            f"compact_ivfpq_index: rename {staging} -> {codes_path} failed"
        )
    fs.delete(bak, True)
    return {
        "rows": int(n_rows),
        "refreshes_folded": len([r for r in refreshes if r != 0]),
    }


def load_ivfpq_index(spark, path: str):
    """(centroids, codebooks, encoded_df) from ``save_ivfpq_index``."""
    import json

    model = json.loads(fs_read_text(spark, f"{path}/model.json"))
    encoded = spark.read.parquet(f"{path}/codes")
    return model["centroids"], model["codebooks"], encoded


def load_ivfpq_model(spark, path: str) -> dict:
    """The full model sidecar as a dict: centroids, codebooks,
    res_norm_baseline, and (after a ``refresh_ivfpq_index``)
    ``cell_codebooks`` with int cell keys — pass the latter to
    ``ivfpq_topk``/``ivfpq_encode`` so probes into refreshed cells score
    against the books their stored codes were written with."""
    import json

    model = json.loads(fs_read_text(spark, f"{path}/model.json"))
    model["cell_codebooks"] = {
        int(c): b for c, b in model.get("cell_codebooks", {}).items()
    }
    return model


def refresh_ivfpq_index(
    vectors: DataFrame,
    path: str,
    threshold: float = 1.25,
    cells: list[int] | None = None,
    max_train: int = 2048,
    seed: int = 42,
    iters: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[dict]:
    """Act on the drift signal: re-train residual codebooks for ONLY the
    cells whose residual distribution has drifted past ``threshold``,
    re-encode only those cells' vectors, and reset their drift baseline —
    O(dirty cells), never O(corpus). This closes the maintenance loop
    ``ivfpq_index_drift`` / ``append_to_ivfpq_index`` open: drift is
    *reported* there; here it is *repaired* without the full re-train a
    from-scratch ``save_ivfpq_index`` would cost.

    ``vectors`` must be the CURRENT indexed corpus (base + all appended
    refreshes) keyed like the index; ids absent from the stored codes are
    ignored (they were never indexed), but the converse is ENFORCED: if
    any id stored in a dirty cell is missing from ``vectors`` (stale
    snapshot) the function raises before touching the index instead of
    silently dropping the row (round-11 advice fix — the re-encode
    overwrite replaces whole partitions, so a shortfall would erase
    entries with no error). ``cells`` forces a refresh of the
    given cells regardless of drift (operational override); otherwise the
    dirty set is ``mean_res_norm(now) / baseline > threshold``.

    Mechanics per dirty cell: bounded md5-ordered sample of the cell's
    vectors (the ``train_ivfpq`` convention — codebook training is tiny
    and driver-side; the DISTRIBUTED work is encoding), residuals against
    the FROZEN coarse centroid (cell membership never changes, so no
    other cell's codes are touched), new per-subspace books via the same
    deterministic Lloyd, stored in model.json as ``cell_codebooks``.
    Re-encoding reads the dirty cells' code partitions (partition-pruned)
    only to recover each id's ``refresh`` batch key, then dynamically
    overwrites exactly the (refresh, cell) partitions it read — an
    at-least-once replay overwrites its own work (the append-path
    idempotency discipline). The baseline for refreshed cells resets to
    the current per-cell mean residual norm: the new books were trained
    on today's distribution, so drift accounting restarts at ~1.

    Returns one report dict per AUDITED cell:
    ``{"cell", "drift", "refreshed"}`` (drift None under a forced
    ``cells=`` override for cells missing a baseline).
    """
    import json

    spark = vectors.sparkSession
    model = json.loads(fs_read_text(spark, f"{path}/model.json"))
    if "res_norm_baseline" not in model:
        raise ValueError(
            "refresh_ivfpq_index: legacy index (no res_norm_baseline); "
            "re-run save_ivfpq_index first"
        )
    centroids, codebooks = model["centroids"], model["codebooks"]
    m, ksub = len(codebooks), len(codebooks[0])
    baseline = {int(c): float(v) for c, v in model["res_norm_baseline"].items()}
    cell_books = {
        int(c): b for c, b in model.get("cell_codebooks", {}).items()
    }

    stats = {
        int(r["cell"]): (int(r["n"]), float(r["mean_res_norm"]))
        for r in residual_stats(vectors, centroids, vec_col=vec_col).collect()
    }
    report: list[dict] = []
    if cells is None:
        dirty = []
        for c, (_, rn) in sorted(stats.items()):
            drift = rn / baseline[c] if baseline.get(c) else None
            hit = drift is not None and drift > threshold
            report.append({"cell": c, "drift": drift, "refreshed": hit})
            if hit:
                dirty.append(c)
    else:
        dirty = sorted(int(c) for c in cells)
        for c in dirty:
            rn = stats.get(c, (0, None))[1]
            drift = (
                rn / baseline[c] if rn is not None and baseline.get(c) else None
            )
            report.append({"cell": c, "drift": drift, "refreshed": True})
    if not dirty:
        return report

    # one Arrow assignment pass, kept only for the dirty cells; eager
    # checkpoint so the per-cell sampling below doesn't re-run the kernel
    assigned = (
        ivfpq_encode(vectors, centroids, codebooks, id_col=id_col, vec_col=vec_col)
        .where(F.col("cell").isin([int(c) for c in dirty]))
        .select(id_col, "cell")
        .localCheckpoint(eager=True)
    )
    vec = vectors.select(id_col, vec_col)
    C = np.asarray(centroids, dtype=np.float64)
    trained: list[int] = []
    # ONE sampling pass for ALL dirty cells (round-12 optimization): the
    # historical form ran |dirty| sequential join+TakeOrdered+collect
    # jobs — O(dirty cells) driver round-trips over the same joined
    # relation. The sample DECISION depends only on (cell, id) — the md5
    # key never reads the vector — so the per-cell top-``max_train`` is
    # taken on the tiny checkpointed ``assigned`` relation (a window
    # limit over ~16 B key rows), and only the ≤ max_train·|dirty|
    # WINNING ids broadcast-join back to the vectors: the corpus-sized
    # embedding relation never shuffles — the single exchange that
    # carries vectors is the final (cell, key) sort of the SELECTED
    # sample rows, bounded by max_train·|dirty| (the guide-§2.3
    # discipline — decide on small rows, move heavy bytes once).
    # Selected rows and their ascending-key order are identical
    # to the per-cell form (same key per (cell, id), same top k). The
    # key is materialized as a column before the sort for the
    # TakeOrderedAndProject reason documented at pq.md5_ordered_sample.
    from pyspark.sql import Window as _W

    key = F.md5(
        F.concat(
            F.lit("ivfpqrefresh:"),
            F.col("cell").cast("string"),
            F.lit(":"),
            F.col(id_col).cast("string"),
        )
    )
    sel = (
        assigned.select("cell", F.col(id_col), key.alias("__k"))
        .withColumn(
            "__rn", F.row_number().over(_W.partitionBy("cell").orderBy("__k"))
        )
        .where(F.col("__rn") <= max_train)
        .drop("__rn")
    )
    sampled = (
        vec.join(F.broadcast(sel), id_col)
        .orderBy("cell", "__k")
        .select("cell", vec_col)
        .toPandas()
    )
    for c in dirty:
        part = sampled.loc[sampled["cell"] == int(c), vec_col]
        X = np.asarray([np.asarray(v, dtype=np.float64) for v in part])
        if len(X) < ksub:
            # not enough members to train ksub codewords — leave the
            # cell on the global/previous books and say so in the report
            for entry in report:
                if entry["cell"] == int(c):
                    entry["refreshed"] = False
                    entry["skipped"] = f"only {len(X)} members < ksub={ksub}"
            continue
        X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        R = X - C[int(c)]
        cell_books[int(c)] = subspace_codebooks(
            R, m=m, ksub=ksub, seed=seed + 7919 * int(c), iters=iters
        )
        trained.append(int(c))
    dirty = trained
    if not dirty:
        return report

    # recover each dirty id's refresh batch key (partition-pruned read of
    # just the dirty cells), re-encode with the merged books, overwrite
    # exactly the partitions read
    # materialize before the write: Spark (rightly) refuses to overwrite
    # a path that is also being read from within one plan, and the
    # relation is O(dirty cells) rows of two tiny columns
    existing = (
        spark.read.parquet(f"{path}/codes")
        .where(F.col("cell").isin([int(c) for c in dirty]))
        .select(id_col, "refresh")
        .localCheckpoint(eager=True)
    )
    re_enc = (
        ivfpq_encode(
            vec.join(
                assigned.where(F.col("cell").isin([int(c) for c in dirty])),
                id_col,
            ).select(id_col, vec_col),
            centroids,
            codebooks,
            id_col=id_col,
            vec_col=vec_col,
            with_res_norm=True,
            cell_codebooks=cell_books,
        )
        .join(existing, id_col)
        .select(id_col, "cell", "pq_code", "res_norm", "refresh")
        # materialized so the reconciliation count below and the write
        # share one encode pass (O(dirty cells) rows either way)
        .localCheckpoint(eager=True)
    )
    # Reconcile BEFORE the destructive overwrite (round-11 advice fix):
    # every id stored in the dirty partitions must come back re-encoded.
    # A shortfall means the caller's `vectors` is a stale corpus snapshot
    # (or an embedding changed enough to move cells, which violates the
    # frozen-membership contract above) — proceeding would silently drop
    # those rows from the index. A surplus means duplicate ids in
    # `vectors`. Either way the index would diverge from the corpus, so
    # fail loudly with the delta instead.
    n_stored = existing.count()
    n_reenc = re_enc.count()
    missing = (
        existing.join(re_enc.select(id_col), id_col, "left_anti")
        .limit(5)
        .collect()
    )
    if n_reenc != n_stored or missing:
        raise ValueError(
            "refresh_ivfpq_index: re-encoded row count "
            f"{n_reenc} != stored row count {n_stored} for dirty cells "
            f"{sorted(dirty)} — `vectors` must be the exact current "
            "indexed corpus (stale snapshot, duplicate ids, or an id "
            "whose embedding changed cells). Example stored ids not "
            f"re-encoded: {[r[0] for r in missing]}"
        )
    (
        re_enc.write.partitionBy("refresh", "cell")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .parquet(f"{path}/codes")
    )

    new_baseline = {
        r["cell"]: float(r["mean_res_norm"])
        for r in spark.read.parquet(f"{path}/codes")
        .where(F.col("cell").isin([int(c) for c in dirty]))
        .groupBy("cell")
        .agg(F.avg("res_norm").alias("mean_res_norm"))
        .collect()
    }
    for c, v in new_baseline.items():
        baseline[int(c)] = v
    model["res_norm_baseline"] = {str(c): v for c, v in baseline.items()}
    model["cell_codebooks"] = {str(c): b for c, b in cell_books.items()}
    fs_write_text(spark, f"{path}/model.json", json.dumps(model))
    return report


