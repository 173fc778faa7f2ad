"""IVF (inverted-file) approximate nearest neighbor search.

The third similarity path beside brute-force cosine and sign-LSH: a coarse
k-means quantizer assigns every corpus vector to its nearest centroid
("cell"); a query searches only the ``nprobe`` nearest cells. Centroids
come from ``pyspark.ml.clustering.KMeans`` (seeded → deterministic); cell
assignment and scoring are JVM column expressions.

Scale shape: training samples the corpus (k-means on a fraction is
standard); assignment is one map-side pass; the search is an equi-join on
cell id — candidates per query ≈ nprobe/k of the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from batch_processing_pipeline_spark.functions.rounding import round4
from batch_processing_pipeline_spark.functions.vector import cosine_similarity
from batch_processing_pipeline_spark.operators.topk import top_k_per_group


def _distance_to(vec_col, centroid: list[float]):
    """Squared L2 distance to a fixed centroid, as an ordered double fold."""
    c = F.lit([float(x) for x in centroid])
    diffs = F.zip_with(vec_col, c, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y))
    return F.aggregate(diffs, F.lit(0.0), lambda a, v: a + v)


def train_centroids(
    corpus: DataFrame,
    vec_col: str = "embedding",
    k: int = 16,
    seed: int = 42,
    sample_fraction: float | None = None,
) -> list[list[float]]:
    """k-means centroids via pyspark.ml (optionally on a sample)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = corpus
    if sample_fraction is not None:
        train = corpus.sample(fraction=sample_fraction, seed=seed)
    feats = train.select(array_to_vector(F.col(vec_col)).alias("features"))
    model = KMeans(k=k, seed=seed, maxIter=20).fit(feats)
    return [list(map(float, c)) for c in model.clusterCenters()]


def assign_cells(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "cell",
    n_cells: int = 1,
) -> DataFrame:
    """Attach the ids of the ``n_cells`` nearest centroids (array column).

    Distance ranking folds over a centroid-matrix literal — expression size
    O(1) in k, same pattern as the sign-LSH planes.
    """
    cent = F.lit([[float(x) for x in c] for c in centroids])
    k = len(centroids)
    scored = F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: F.struct(
            F.aggregate(
                F.zip_with(
                    F.col(vec_col),
                    F.element_at(cent, (i + F.lit(1)).cast("int")),
                    lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
                ),
                F.lit(0.0),
                lambda a, v: a + v,
            ).alias("dist"),
            i.alias("cell"),
        ),
    )
    nearest = F.slice(F.array_sort(scored), 1, n_cells)
    return df.withColumn(out_col, F.transform(nearest, lambda s: s["cell"]))


def assign_cells_bulk(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "cell",
    n_cells: int = 1,
) -> DataFrame:
    """(id, cell array) for every vector — codegen bulk formulation.

    The column form above folds k × dim element lambdas per row, which run
    INTERPRETED. Here the vector explodes to (id, pos, v) once, joins a
    broadcast (cell, pos, coef) centroid relation, and a map-side-combining
    SUM builds all k squared distances per id in one codegen'd aggregation;
    the n nearest cells are a two-phase top-k (WindowGroupLimit). Same
    pattern as ``similarity.signlsh_buckets``. Distances differ from the
    fold form only by float summation order (ties could in principle
    resolve differently; cell id breaks them deterministically either way).
    """
    from pyspark.sql import Window

    spark = df.sparkSession
    cent_rows = [
        (cell, pos, float(v))
        for cell, c in enumerate(centroids)
        for pos, v in enumerate(c)
    ]
    cent = spark.createDataFrame(cent_rows, "cell int, pos int, coef double")
    dists = (
        df.select(F.col(id_col), F.posexplode(F.col(vec_col)).alias("pos", "v"))
        .join(F.broadcast(cent), "pos")
        .groupBy(id_col, "cell")
        .agg(
            F.sum(
                (F.col("v").cast("double") - F.col("coef"))
                * (F.col("v").cast("double") - F.col("coef"))
            ).alias("dist")
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("dist").asc(), F.col("cell").asc())
    return (
        dists.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= n_cells)
        .groupBy(id_col)
        .agg(F.array_agg(F.struct("_rk", "cell")).alias("_sc"))
        .select(
            F.col(id_col),
            F.transform(F.array_sort("_sc"), lambda s: s["cell"]).alias(out_col),
        )
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k cosine via IVF cells.

    Corpus vectors live in their single nearest cell; queries probe their
    ``nprobe`` nearest cells. Join on cell id → exact cosine on candidates
    → per-query top-k.
    """
    c = (
        assign_cells_bulk(corpus, centroids, id_col, vec_col, n_cells=1)
        .join(corpus.select(id_col, vec_col), id_col)
        .select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("c_vec"),
            F.explode("cell").alias("cell"),
        )
    )
    q = (
        assign_cells_bulk(queries, centroids, id_col, vec_col, n_cells=nprobe)
        .join(queries.select(id_col, vec_col), id_col)
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            F.explode("cell").alias("cell"),
        )
    )
    scored = (
        F.broadcast(q)
        .join(c, "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .select(
            "query_id",
            "neighbor_id",
            round4(cosine_similarity(F.col("q_vec"), F.col("c_vec"))).alias("cosine"),
        )
    )
    return top_k_per_group(
        scored,
        group_cols=["query_id"],
        order_by=[F.desc("cosine"), F.asc("neighbor_id")],
        k=k,
    ).select("query_id", "rk", "neighbor_id", "cosine")