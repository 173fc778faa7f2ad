"""Query registry: every operator the engine claims, as a runnable query.

Each entry pairs a PySpark implementation (built from the engine's operator
library where one applies, plain declarative DataFrame code otherwise) with
an equivalent DuckDB oracle SQL string. The driver runs both at sf=0.01 and
hash-compares results, so every computed column is aliased identically on
both sides, floats go through the portable ``round4`` formula (see
functions/rounding.py — plain ROUND(x,4) is not engine-portable at half-way
boundaries), timestamps are projected to epoch seconds, and every ranking
carries a unique tie-break (determinism contract, SURVEY.md §2.4 /
FIXTURES.md §C).

Entries whose oracle is ``None`` are genuinely hash-dependent or approximate
(MinHash/SimHash/LSH) — the driver records a rows-only check and pytest
validates them against exact ground truth instead.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd  # module-level: pandas_udf type hints resolve from here
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from batch_processing_pipeline_spark.catalog import table_path
from batch_processing_pipeline_spark.functions.rounding import (
    cents,
    round4,
    sql_cents,
    sql_round4,
    sql_sum_money,
    sum_money,
)
from batch_processing_pipeline_spark.functions.text_analysis import (
    STOPWORDS,
    bpe_ish_token_count,
    language_id,
    punct_ratio,
    quality_score,
    stopword_ratio,
    tokens,
    whitespace_token_count,
)
from batch_processing_pipeline_spark.multimodal.binary_ops import attach_media, media_stats
from batch_processing_pipeline_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_dedup,
    ngram_jaccard_pairs,
    simhash_dedup,
)
from batch_processing_pipeline_spark.operators.prefix import (
    expand_prefixes,
    normalize_queries,
    prefix_frequencies,
)
from batch_processing_pipeline_spark.operators.sessionize import sessionize
from batch_processing_pipeline_spark.operators.similarity import cosine_topk, signlsh_topk
from batch_processing_pipeline_spark.operators.topk import top_k_per_group

R = sql_round4


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(table_path(sf_dir, name))


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events table with its TIMESTAMP(NANOS) parquet column normalized.

    The fixture stores nanosecond timestamps, which Spark's vectorized
    reader rejects; ``nanosAsLong`` reads them as raw nanos and we truncate
    to microseconds — exactly what DuckDB's reader does, so both engines see
    identical microsecond values.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(table_path(sf_dir, "events"))
    if dict(raw.dtypes)["ts"] == "bigint":
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw




#: the shared registries every section module fills at import time —
#: insertion order IS the driver-window ordering contract
#: (see __spark_entry__), so ``__init__`` imports the sections in the
#: original single-file order.
QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str | None] = {}
