"""TF-IDF over a document corpus — the reference's adjacent scoring system
(`docker-compose.yml:222-250` wires two "Tf-IDF-Distributed-System" nodes
into the same network), re-expressed as three hash aggregations.

Formula (smoothed, sklearn-style): tfidf = tf · (ln((1+N)/(1+df)) + 1).

Scale shape: tokenize→explode is map-side; term frequencies and document
frequencies are partial-aggregated before their shuffles; the corpus size N
joins in as a broadcast 1-row aggregate (never a window over a single
partition). ``pyspark.ml.feature.HashingTF/IDF`` gives the same capability
as vectors; this columnar form keeps (doc, term, weight) rows queryable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from batch_processing_pipeline_spark.functions.text_analysis import tokens


def tfidf(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "tfidf",
) -> DataFrame:
    """(id, word, tf, tfidf) for every document-term pair."""
    tok = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("word")
    )
    tf = tok.groupBy(id_col, "word").agg(F.count(F.lit(1)).alias("tf"))
    docfreq = tok.groupBy("word").agg(
        F.countDistinct(id_col).alias("df_docs")
    )
    n = df.select(F.countDistinct(id_col).alias("n_docs"))
    idf = F.log((F.lit(1.0) + F.col("n_docs")) / (F.lit(1.0) + F.col("df_docs"))) + F.lit(1.0)
    return (
        tf.join(F.broadcast(docfreq), "word")
        .crossJoin(F.broadcast(n))
        .select(
            F.col(id_col),
            "word",
            "tf",
            (F.col("tf") * idf).alias(out_col),
        )
    )
