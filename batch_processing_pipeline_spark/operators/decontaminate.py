"""Benchmark decontamination: drop corpus documents that overlap an
evaluation set.

Training corpora must not contain the benchmarks they are evaluated on
(GPT-3 §2.2, Gopher appendix; the standard is n-gram overlap — e.g. any
shared 8-to-13-gram marks a document contaminated). This is CROSS-SET
containment, not self-dedup: the corpus is 100 TB, the benchmark set is
megabytes.

Scale design: the benchmark's shingle hashes form the small side — a
broadcast set of 8-byte longs (a few million entries for every public
benchmark combined). The corpus side explodes shingle positions through a
codegen'd ``xxhash64`` and probes the broadcast set MAP-SIDE (left-semi
broadcast join); only (contaminated doc_id) rows — a tiny fraction — ever
reach a shuffle, and the final anti-join prunes by id. The corpus text is
read once and never shuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _shingle_hashes(df: DataFrame, id_col: str, text_col: str, n: int, seed: int) -> DataFrame:
    """(id, h) — one codegen'd xxhash64 per character n-gram position.

    CPU-bound; spread compacted inputs across the cluster (no-op at real
    scale where sources have thousands of splits)."""
    spark = df.sparkSession
    if df.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism:
        df = df.repartition(spark.sparkContext.defaultParallelism)
    t = F.lower(F.trim(F.col(text_col)))
    return (
        df.select(F.col(id_col), t.alias("_t"))
        .where(F.length("_t") >= n)
        .select(
            F.col(id_col),
            F.explode(F.sequence(F.lit(1), F.length("_t") - F.lit(n - 1))).alias("_i"),
            "_t",
        )
        .select(
            F.col(id_col),
            F.xxhash64(F.col("_t").substr(F.col("_i"), F.lit(n)), F.lit(seed)).alias("h"),
        )
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 8,
    seed: int = 823_541,
) -> DataFrame:
    """Corpus rows sharing NO character ``ngram``-gram with the benchmark.

    Returns the surviving corpus rows (original columns). Documents shorter
    than ``ngram`` have no shingles and always survive. Overlap is tested
    on 64-bit shingle hashes — a false contamination needs an xxhash64
    collision against the benchmark set (~|bench|·d/2⁶⁴ per doc).
    """
    bench_h = (
        _shingle_hashes(benchmark, id_col, text_col, ngram, seed)
        .select("h")
        .distinct()
    )
    corpus_h = _shingle_hashes(corpus, id_col, text_col, ngram, seed)
    contaminated = (
        corpus_h.join(F.broadcast(bench_h), "h", "left_semi")
        .select(id_col)
        .distinct()
    )
    return corpus.join(contaminated, id_col, "left_anti")


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 8,
    seed: int = 823_541,
) -> DataFrame:
    """(doc_id, n_hits) per CONTAMINATED corpus document — how many distinct
    shingle hashes it shares with the benchmark (audit view of the same
    broadcast probe; corpus text still never shuffles)."""
    bench_h = (
        _shingle_hashes(benchmark, id_col, text_col, ngram, seed)
        .select("h")
        .distinct()
    )
    corpus_h = _shingle_hashes(corpus, id_col, text_col, ngram, seed).distinct()
    return (
        corpus_h.join(F.broadcast(bench_h), "h", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
