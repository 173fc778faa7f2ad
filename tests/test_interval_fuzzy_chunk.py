"""Round-2 additions: bucketed interval join, deletion-neighborhood fuzzy
matching, document chunking, and the salted replicated join — each checked
against a brute-force/naive formulation of the same semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from batch_processing_pipeline_spark.operators.chunking import chunk_documents
from batch_processing_pipeline_spark.operators.fuzzy import fuzzy_self_join
from batch_processing_pipeline_spark.operators.interval import bucketed_interval_join
from batch_processing_pipeline_spark.operators.skew import salted_join


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


# ---------------------------------------------------------------- interval


def test_interval_join_equals_naive_theta(spark):
    # points every 100 s; intervals of assorted widths, some crossing
    # bucket boundaries, one empty, one sub-bucket, one covering many
    pts = spark.range(0, 100).select(
        F.col("id").alias("pid"), (F.col("id") * 100).alias("pt")
    )
    iv = spark.createDataFrame(
        [(1, 250, 260), (2, 0, 1000), (3, 990, 1010), (4, 5000, 5000),
         (5, 300, 9900), (6, 9899, 9901)],
        "iid long, s long, e long",
    )
    got = bucketed_interval_join(pts, iv, "pt", "s", "e", bucket_seconds=256)
    naive = pts.join(iv, (F.col("pt") >= F.col("s")) & (F.col("pt") < F.col("e")))
    assert _rows(got, "pid", "iid") == _rows(naive, "pid", "iid")
    # no duplicate pairs from the bucket explode
    assert got.count() == got.select("pid", "iid").distinct().count()


def test_interval_join_validates_args(spark):
    df = spark.range(1).select(F.col("id").alias("pt"))
    iv = spark.range(1).select(F.col("id").alias("s"), (F.col("id") + 1).alias("e"))
    with pytest.raises(ValueError):
        bucketed_interval_join(df, iv, "pt", "s", "e", bucket_seconds=0)
    with pytest.raises(ValueError):
        bucketed_interval_join(df, iv, "pt", "s", "e", bucket_seconds=60, how="left")


# ------------------------------------------------------------------- fuzzy


def test_fuzzy_join_equals_bruteforce(spark):
    words = [
        "spark", "sparc", "spak", "spark", "shark", "park",
        "batch", "match", "latch", "web", "wet", "we", "x", "",
        "pipeline", "pipelines", "pipelime", "zzzzz",
    ]
    df = spark.createDataFrame(
        [(f"w{i:02d}", w) for i, w in enumerate(words)], "nid string, s string"
    )
    got = _rows(fuzzy_self_join(df, "nid", "s"), "id_a", "id_b", "distance")
    a, b = df.alias("a"), df.alias("b")
    brute = (
        a.join(b, F.col("a.nid") < F.col("b.nid"))
        .where(F.levenshtein("a.s", "b.s") <= 1)
        .select(
            F.col("a.nid").alias("id_a"),
            F.col("b.nid").alias("id_b"),
            F.levenshtein("a.s", "b.s").cast("long").alias("distance"),
        )
    )
    assert got == _rows(brute, "id_a", "id_b", "distance")
    # sanity: blocking found substitutions, deletions, AND insertions
    w = {f"w{i:02d}": s for i, s in enumerate(words)}
    spairs = {frozenset((w[x], w[y])) for x, y, _ in got}
    assert frozenset(("spark", "sparc")) in spairs  # substitution
    assert frozenset(("spak", "spark")) in spairs  # insertion
    assert frozenset(("we", "wet")) in spairs  # deletion
    assert frozenset(("", "x")) in spairs  # empty string vs 1-char


def test_fuzzy_join_rejects_d2(spark):
    df = spark.createDataFrame([("a", "x")], "nid string, s string")
    with pytest.raises(ValueError):
        fuzzy_self_join(df, "nid", "s", max_distance=2)


# ---------------------------------------------------------------- chunking


def test_chunk_documents_covers_and_overlaps(spark):
    text = "abcdefghij" * 95  # 950 chars -> starts 1, 401, 801 (size 500)
    df = spark.createDataFrame([(1, text), (2, "short"), (3, None), (4, "")],
                               "doc_id long, text string")
    out = chunk_documents(df, "doc_id", "text", size=500, stride=400,
                          keep_text=True).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 3 not in by_doc and 4 not in by_doc
    assert [r.chunk_start for r in sorted(by_doc[1], key=lambda r: r.chunk_idx)] == [
        1, 401, 801,
    ]
    chunks = [r.chunk_text for r in sorted(by_doc[1], key=lambda r: r.chunk_idx)]
    assert chunks[0] == text[0:500] and chunks[1] == text[400:900]
    assert chunks[2] == text[800:950] and len(chunks[2]) == 150
    # overlap region agrees between consecutive chunks
    assert chunks[0][400:] == chunks[1][:100]
    # single short doc: one chunk, the whole text
    assert [r.chunk_text for r in by_doc[2]] == ["short"]


def test_chunk_documents_validates(spark):
    df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", size=0, stride=1)
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", size=10, stride=11)


# -------------------------------------------------------------- salted join


def test_salted_join_equals_plain_join(spark):
    # one hot key (k=0 carries half the rows) + normal keys + orphans
    fact = spark.createDataFrame(
        [(i, i % 2 * (i % 7), float(i)) for i in range(200)] + [(999, 42, 1.0)],
        "rid long, k long, v double",
    )
    dim = spark.createDataFrame(
        [(i, f"d{i}") for i in range(7)], "k long, label string"
    )
    got = salted_join(fact, dim, on="k", salt_key=["rid"], salt_buckets=4)
    plain = fact.join(dim, "k")
    assert _rows(got, "rid", "k", "label") == _rows(plain, "rid", "k", "label")
    # left join keeps orphans with null labels
    got_l = salted_join(fact, dim.where("k < 3"), on="k", salt_key=["rid"],
                        salt_buckets=4, how="left")
    plain_l = fact.join(dim.where("k < 3"), "k", "left")
    assert _rows(got_l, "rid", "k", "label") == _rows(plain_l, "rid", "k", "label")
    with pytest.raises(ValueError):
        salted_join(fact, dim, on="k", how="full")
