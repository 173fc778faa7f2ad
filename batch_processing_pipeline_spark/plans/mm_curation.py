"""Multimodal curation funnel — the composed pipeline a multimodal
pretraining corpus runs, as ONE differentially-verified plan:
text quality → image dimension gate → audio energy gate → exact dedup →
per-stage accounting.

The pretrain_pipeline twin for (text, image, audio) triples: the two
media gates run REAL decoders (PNG header+pixel decode, RIFF/WAVE chunk
walk + PCM) inside Arrow-batched ``mapInPandas`` — this is the
load-bearing demonstration that a composed funnel can interleave
column-expression stages with binary-decode stages without leaving the
one-plan accounting discipline. Payloads are the deterministic synthetic
media of multimodal/binary_ops (dims / samples derived from text length),
so the DuckDB twin re-derives every gate arithmetically and the funnel
stays oracle-checkable end to end even though the engine path decodes
real bytes.

Scale notes: stage 1 is a column predicate (scan speed); stages 2-3
shuffle nothing — each is a mapInPandas projection to (doc_id, gate
fields) followed by a filter, and the relations persist so each decode
pass materializes exactly once (the pretrain_pipeline single-pass
accounting lesson); stage 4 shuffles 16-byte digests only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: minimum decoded image edge — drops sub-thumbnail payloads
MIN_EDGE = 3
#: minimum whole-clip RMS energy about the 8-bit midpoint — silence gate
MIN_RMS = 70.0
#: the squared threshold actually compared (clip RMS >= MIN_RMS  <=>
#: SUM(energy) >= MIN_RMS_SQ * SUM(n), both sides exact integers). The
#: single shared constant: the plan's predicate and the DuckDB oracle
#: both reference THIS value, so a threshold edit cannot drift silently.
MIN_RMS_SQ = 4900
# a non-integer RMS (or a drifted square) would silently diverge the
# plan predicate from the documented threshold — fail loudly at import.
# Explicit raise, not assert: asserts vanish under ``python -O``.
if not float(MIN_RMS).is_integer() or int(MIN_RMS) ** 2 != MIN_RMS_SQ:
    raise ValueError(
        f"MIN_RMS ({MIN_RMS}) and MIN_RMS_SQ ({MIN_RMS_SQ}) are out of "
        "sync — the audio gate and its oracle would silently diverge"
    )


def mm_curation_pipeline(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Run the funnel; return (stage_idx, stage, n_docs) accounting rows.

    ``docs``: (doc_id, text). Gate fields come from REAL decodes of the
    synthesized payloads; the thresholds are data-calibrated (fixture
    RMS spans ~65-110, median 74; dims span 1x1-13x7) so every gate
    actually discriminates.
    """
    from batch_processing_pipeline_spark.multimodal.binary_ops import (
        audio_frame_features,
        synthesize_png,
        synthesize_wav,
    )
    from batch_processing_pipeline_spark.multimodal import codecs

    from collections.abc import Iterator

    import pandas as pd

    corpus = docs.where(F.length(F.trim(F.col("text"))) > 0)

    # stage 1 — text quality: alpha-character density (keyword-stuffed /
    # markup-heavy text fails this before any decode work is spent)
    alpha = F.length(F.regexp_replace(F.col("text"), r"[^a-zA-Z]", ""))
    s1 = corpus.where(
        alpha.cast("double") / F.length("text").cast("double") >= 0.5
    )

    # stage 2 — image dimension gate via REAL PNG decode
    def dims(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs = [], [], []
            for doc_id, data in zip(pdf["doc_id"], pdf["content"]):
                w, h, _c, _px = codecs.decode_png(bytes(data))
                ids.append(doc_id)
                ws.append(w)
                hs.append(h)
            yield pd.DataFrame({"doc_id": ids, "w": ws, "h": hs})

    img = synthesize_png(s1).mapInPandas(dims, "doc_id long, w int, h int")
    ok_img = img.where(
        (F.col("w") >= MIN_EDGE) & (F.col("h") >= MIN_EDGE)
    ).select("doc_id")
    s2 = s1.join(ok_img, "doc_id", "left_semi").persist()

    # stage 3 — audio energy gate via REAL WAV decode. Gate on the EXACT
    # integer energy (sum of squared centered amplitudes, int64 per
    # frame): clip RMS >= 70  <=>  SUM(energy) >= 70^2 * SUM(n) — both
    # sides exact integers, bit-identical to any oracle engine, no sqrt
    # in the predicate (a sqrt round-trip can flip a clip sitting exactly
    # on the threshold by 1 ulp).
    feats = audio_frame_features(synthesize_wav(s2), frame_len=16)
    clip_energy = feats.groupBy("doc_id").agg(
        F.sum("energy").alias("energy"), F.sum("n_samples").alias("n")
    )
    ok_audio = clip_energy.where(
        F.col("energy") >= F.lit(MIN_RMS_SQ) * F.col("n")
    ).select("doc_id")
    s3 = s2.join(ok_audio, "doc_id", "left_semi").persist()

    # stage 4 — exact text dedup (keep min doc_id per digest)
    fp = F.md5(F.lower(F.trim(F.col("text"))))
    keep = (
        s3.select("doc_id", fp.alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    s4 = s3.join(keep, "doc_id", "left_semi")

    counts = [
        corpus.select(
            F.lit(0).alias("stage_idx"), F.lit("corpus").alias("stage"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
        ),
        s1.select(
            F.lit(1).alias("stage_idx"), F.lit("text_quality").alias("stage"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
        ),
        s2.select(
            F.lit(2).alias("stage_idx"), F.lit("image_dims").alias("stage"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
        ),
        s3.select(
            F.lit(3).alias("stage_idx"), F.lit("audio_energy").alias("stage"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
        ),
        s4.select(
            F.lit(4).alias("stage_idx"), F.lit("exact_dedup").alias("stage"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
        ),
    ]
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out.select(
        F.col("stage_idx").cast("int").alias("stage_idx"), "stage", "n_docs"
    )
