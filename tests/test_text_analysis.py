"""Text-analysis functions: language ID, quality, tokens, templating."""

from __future__ import annotations

from pyspark.sql import functions as F

from batch_processing_pipeline_spark.functions.text_analysis import (
    bpe_ish_token_count,
    doc_fingerprint,
    language_id,
    quality_score,
    template_placeholders,
    whitespace_token_count,
)


def test_language_id_on_real_sentences(spark):
    rows = [
        (0, "the cat sat on a mat and it is happy for now"),
        (1, "der hund ist nicht mit der katze und das ist gut"),
        (2, "el perro es un animal que vive en la casa con nosotros"),
        (3, "le chien est dans la maison et ce que pour un chat"),
        (4, "zzz qqq xxx"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r.id: r.lang for r in df.select("id", language_id(F.col("text")).alias("lang")).collect()}
    assert got == {0: "en", 1: "de", 2: "es", 3: "fr", 4: "und"}


def test_token_counts(spark):
    df = spark.createDataFrame([("Hello, world! 42 times",)], "text string")
    r = df.select(
        whitespace_token_count(F.col("text")).alias("ws"),
        bpe_ish_token_count(F.col("text")).alias("bpe"),
    ).collect()[0]
    assert r.ws == 4
    # Hello , world ! 4 2 times → 7 BPE-ish pretokens
    assert r.bpe == 7


def test_quality_score_ranks_prose_above_junk(spark):
    rows = [(0, "A well formed sentence with reasonable words and structure." * 4),
            (1, "!!! ??? ### $$$ %%% ^^^ &&&")]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r.id: r.q for r in df.select("id", quality_score(F.col("text")).alias("q")).collect()}
    assert got[0] > 0.7
    assert got[1] < 0.5


def test_fingerprint_is_normalization_invariant(spark):
    df = spark.createDataFrame(
        [("  Hello World ",), ("hello world",)], "text string"
    )
    fps = [r.fp for r in df.select(doc_fingerprint(F.col("text")).alias("fp")).collect()]
    assert fps[0] == fps[1]


def test_template_placeholders_ner_style(spark):
    """The reference's planned NER templating (NER-Explanation.txt:4-6):
    'how to install docker in ubuntu' → 'how to install APPLICATION in OS'."""
    df = spark.createDataFrame([("how to install Docker in Ubuntu",)], "text string")
    out = df.select(
        template_placeholders(
            F.col("text"),
            {"OS": ["windows", "ubuntu"], "APPLICATION": ["docker", "chrome"]},
        ).alias("t")
    ).collect()[0].t
    assert out == "how to install APPLICATION in OS"
