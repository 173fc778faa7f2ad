"""End-to-end pretraining-data curation pipeline — the composed
"user story" every LLM-data team runs, as ONE differentially-verified
plan: quality rules → language filter → exact dedup → near-dup dedup →
benchmark decontamination → per-stage accounting.

Every stage reuses the registry-proven primitive with IDENTICAL
semantics (curation_rules' rule panel, exact_dedup's keep-min-id,
setsim's exact prefix-filtered Jaccard join, decontaminate's 24-char-gram
probe), so the composed funnel is oracle-checkable end to end: the
DuckDB twin re-derives every stage from raw documents and must land on
the same survivor counts. What the composition adds over the parts is
the ORDER contract (each stage sees exactly the previous stage's
survivors — dedup after quality filtering keeps a different set than
before it) and the accounting row per stage that a data-governance
review consumes.

Scale notes: stages 1–2 are column predicates (scan speed); stage 3
shuffles 16-byte digests; stage 4 is the EXACT prefix-filtered
set-similarity join (the only exact scale path — at web scale the
MinHash+LSH operator substitutes with the same drop rule on its
candidate pairs); stage 5 broadcasts the eval-set gram hashes, the
corpus never shuffles. Reference: the reference repo has no curation
pipeline at all — this is charter surface (LLM-pipeline extensions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from batch_processing_pipeline_spark.operators.setsim import ppjoin_pairs

#: near-dup drop threshold — tight (0.9) keeps PPJoin's prefixes short
#: (better pruning) and matches "near-identical template copies"
NEAR_DUP_THRESHOLD = 0.9


def _quality_keep(d: DataFrame) -> DataFrame:
    """curation_rules' conjunctive keep flag, verbatim semantics."""
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    n_words = F.size(toks)
    mean_wl = F.aggregate(
        toks, F.lit(0), lambda acc, w: acc + F.length(w)
    ).cast("double") / n_words.cast("double")
    has_stop = F.arrays_overlap(
        toks, F.array(F.lit("the"), F.lit("a"), F.lit("of"))
    )
    return d.where(
        (n_words >= 20)
        & (n_words <= 10000)
        & (mean_wl >= 3.0)
        & (mean_wl <= 10.0)
        & has_stop
    )


def pretrain_pipeline(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Run the funnel; return (stage_idx, stage, n_docs) accounting rows.

    ``docs``: (doc_id, text, lang). Documents with ``doc_id % 97 == 0``
    play the held-out benchmark (decontamination probe side) and are not
    part of the corpus funnel — same convention as the ``decontaminate``
    registry query.

    Accounting shape: rather than six unioned count branches (each of
    which would recompute the entire upstream lineage — measured ~6× the
    single-pass cost with the Jaccard join run twice), the funnel
    persists the two join-produced survivor relations (the exact-dedup
    and near-dedup outputs — each feeds its own count AND everything
    downstream) so the expensive stages materialize exactly once;
    measured 28 s → ~4 s at sf0.1.
    """
    bench = docs.where(F.col("doc_id") % 97 == 0).select("doc_id", "text")
    corpus = docs.where(F.col("doc_id") % 97 != 0)

    s1 = _quality_keep(corpus)
    s2 = s1.where(F.col("lang") == "en")

    # exact dedup: keep the minimum doc_id per normalized-content digest
    fp = F.md5(F.lower(F.trim(F.col("text"))))
    keep_ids = (
        s2.select(F.col("doc_id"), fp.alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    s3 = s2.join(keep_ids, "doc_id", "left_semi").persist()

    # near-dup dedup: exact prefix-filtered word-set Jaccard ≥ 0.9 among
    # survivors; drop the higher id of every pair (keep-first sweep —
    # same rule as semdedup; at web scale minhash_lsh_dedup substitutes)
    pairs = ppjoin_pairs(
        s3.select("doc_id", "text"), threshold=NEAR_DUP_THRESHOLD
    )
    dropped = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    s4 = s3.join(dropped, "doc_id", "left_anti").persist()

    # decontamination: drop survivors sharing any 24-char-gram with the
    # benchmark set (broadcast probe — the corpus never shuffles)
    from batch_processing_pipeline_spark.operators.decontaminate import (
        decontaminate,
    )

    s5 = decontaminate(s4.select("doc_id", "text"), bench, ngram=24)

    # one row per stage from one count per (already-persisted) relation;
    # only the stage-0/1/2 predicates re-evaluate (scan-speed column
    # exprs), the join/pair stages are materialized exactly once
    counts = [
        corpus.select(
            F.lit(0).alias("stage_idx"), F.lit("corpus").alias("stage"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
        ),
        s1.select(
            F.lit(1).alias("stage_idx"), F.lit("quality").alias("stage"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
        ),
        s2.select(
            F.lit(2).alias("stage_idx"), F.lit("lang_en").alias("stage"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
        ),
        s3.select(
            F.lit(3).alias("stage_idx"), F.lit("exact_dedup").alias("stage"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
        ),
        s4.select(
            F.lit(4).alias("stage_idx"), F.lit("near_dedup").alias("stage"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
        ),
        s5.select(
            F.lit(5).alias("stage_idx"),
            F.lit("decontaminated").alias("stage"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
        ),
    ]
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out.select(F.col("stage_idx").cast("int").alias("stage_idx"),
                      "stage", "n_docs")
