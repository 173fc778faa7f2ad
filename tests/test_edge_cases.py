"""Empty- and degenerate-input behavior of the main operators.

A 100 TB pipeline hits empty slices constantly (an hour with no logs, a
partition with no survivors, a filter that eliminates a batch); operators
must return EMPTY WITH THE RIGHT SCHEMA, not throw — downstream unions
and writes depend on it.
"""

from __future__ import annotations

import pyspark.sql.types as T
from pyspark.sql import functions as F

from batch_processing_pipeline_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_dedup,
    ngram_jaccard_pairs,
)
from batch_processing_pipeline_spark.operators.prefix import (
    expand_prefixes,
    normalize_queries,
)
from batch_processing_pipeline_spark.operators.sampling import (
    deterministic_sample,
)
from batch_processing_pipeline_spark.operators.topk import top_k_per_group

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def _empty_docs(spark):
    return spark.createDataFrame([], DOC_SCHEMA)


def test_dedup_ops_on_empty_input(spark):
    e = _empty_docs(spark)
    assert exact_dedup(e, text_col="text").count() == 0
    assert minhash_lsh_dedup(e).count() == 0
    assert ngram_jaccard_pairs(e, shingle_n=3, threshold=0.5).count() == 0


def test_prefix_pipeline_on_empty_input(spark):
    raw = spark.createDataFrame([], T.StructType([T.StructField("value", T.StringType())]))
    norm = normalize_queries(raw)
    assert norm.count() == 0
    fanned = expand_prefixes(norm.select(F.col("query")), max_len=8)
    assert fanned.count() == 0
    assert "prefix" in fanned.columns


def test_topk_on_empty_input(spark):
    df = spark.createDataFrame(
        [],
        T.StructType(
            [
                T.StructField("g", T.StringType()),
                T.StructField("v", T.LongType()),
            ]
        ),
    )
    out = top_k_per_group(df, group_cols=["g"], order_by=[F.desc("v")], k=3)
    assert out.count() == 0


def test_sampling_on_empty_input(spark):
    e = _empty_docs(spark)
    assert deterministic_sample(e, key_col="doc_id", fraction=0.5).count() == 0


def test_dedup_single_row_and_whitespace_only(spark):
    one = spark.createDataFrame([(1, "hello world")], DOC_SCHEMA)
    assert minhash_lsh_dedup(one).count() == 0  # no pair with itself
    blank = spark.createDataFrame([(1, "   "), (2, "")], DOC_SCHEMA)
    # whitespace-only docs are shorter than a shingle: filtered, not crashed
    assert minhash_lsh_dedup(blank).count() == 0
    assert ngram_jaccard_pairs(blank, shingle_n=3, threshold=0.5).count() == 0


def test_expand_prefixes_respects_short_strings(spark):
    df = spark.createDataFrame([("a",), ("ab",), ("abc",)], "query string")
    out = expand_prefixes(df, max_len=8).collect()
    # length-1 never fans out (min prefix len 2); "ab"→1, "abc"→2
    got = sorted(r.prefix for r in out)
    assert got == ["ab", "ab", "abc"]


def test_observed_quality_metrics_ride_the_write(spark, tmp_path):
    """df.observe computes ingest-gate metrics on the SAME job as the
    action — no second scan — and the gate fires on contract violations."""
    import pytest
    from pyspark.sql import functions as F

    from batch_processing_pipeline_spark.operators.observe import (
        assert_quality,
        observed_quality,
    )

    # Registered observations live in session state, and a session that
    # has hosted one can later leak its (non-serializable)
    # ObservationManager into RDD-closure jobs (Spark ML) — so observe in
    # a sibling session, as the module docstring prescribes.
    spark = spark.newSession()
    df = spark.range(100).select(
        F.col("id"),
        F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id")).alias("v"),
    )
    observed, obs = observed_quality(df, null_cols=("v",), range_col="id")
    observed.write.mode("overwrite").parquet(str(tmp_path / "out"))
    got = assert_quality(obs, min_rows=1, max_null_fraction=0.2)
    assert got["rows"] == 100
    assert got["nulls_v"] == 10
    assert got["min_id"] == 0 and got["max_id"] == 99

    observed2, obs2 = observed_quality(df, null_cols=("v",))
    observed2.count()
    with pytest.raises(ValueError, match="nulls_v"):
        assert_quality(obs2, max_null_fraction=0.05)


def test_boilerplate_ngrams_handles_sub_5_token_documents(spark, tmp_path):
    """Documents with fewer than 5 tokens must be silently gram-less (as
    in the oracle), not a runtime slice() error from negative positions."""
    from batch_processing_pipeline_spark.registry import QUERIES

    docs = spark.createDataFrame(
        [
            (1, "hello world"),
            (2, "one two three four"),
            (3, "a b c d e f g h i j k l m n o p q r s t"),
        ],
        "doc_id long, text string",
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = {r.doc_id: r for r in QUERIES["boilerplate_ngrams"](spark, str(tmp_path)).collect()}
    assert set(rows) == {3}  # short docs have no 5-grams at all
    assert rows[3].n_grams == 16 and rows[3].n_boiler == 0
