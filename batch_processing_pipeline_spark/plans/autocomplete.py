"""The reference pipeline, end-to-end, as one declarative plan.

Reference (``IncrementalAutocomplete.java:63-145``): hourly query log →
normalize → prefix fan-out → count → merge into cumulative MySQL table →
top-K per prefix → ``prefix → JSON array of completions`` serving table.

This plan composes the engine operators and returns DataFrames; sinks are the
caller's business (parquet state store, JDBC upsert, Kafka — see sources/ and
streaming/). Hazards H1/H2/H4/H5/H8/H10 are fixed in the composed operators;
H1 additionally requires the caller to persist the merged state exactly once
(``run_incremental_batch`` demonstrates the stage-then-swap discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from batch_processing_pipeline_spark.operators.prefix import (
    DEFAULT_MAX_PREFIX_LEN,
    DEFAULT_MIN_PREFIX_LEN,
    normalize_queries,
    prefix_frequencies,
)
from batch_processing_pipeline_spark.operators.merge import merge_frequencies
from batch_processing_pipeline_spark.operators.topk import (
    ordered_collect,
    top_k_per_group,
)


def suggestions(
    freq: DataFrame,
    k: int = 10,
    as_json: bool = True,
    completions_col: str = "completions",
) -> DataFrame:
    """(prefix, query, frequency) → (prefix, completions[, completions_json]).

    Deterministic ranking (frequency DESC, query ASC — H5 fix) and
    rank-ordered arrays (H4 fix). ``as_json`` additionally serializes the
    array for JSON-typed serving columns
    (``IncrementalAutocomplete.java:128``).
    """
    ranked = top_k_per_group(
        freq,
        group_cols=["prefix"],
        order_by=[F.desc("frequency"), F.asc("query")],
        k=k,
    )
    out = ordered_collect(
        ranked, group_cols=["prefix"], rank_col="rk", value_col="query",
        out_col=completions_col,
    )
    if as_json:
        out = out.withColumn("completions_json", F.to_json(F.col(completions_col)))
    return out


def autocomplete_batch(
    raw_lines: DataFrame,
    state: DataFrame | None = None,
    k: int = 10,
    text_col: str = "value",
    min_len: int = DEFAULT_MIN_PREFIX_LEN,
    max_len: int = DEFAULT_MAX_PREFIX_LEN,
) -> tuple[DataFrame, DataFrame]:
    """One incremental batch: returns ``(merged_state, suggestions)``.

    ``merged_state``: cumulative (prefix, query, frequency) after this batch.
    ``suggestions``: (prefix, completions, completions_json) top-K table.
    """
    queries = normalize_queries(raw_lines, text_col=text_col, min_len=min_len)
    new_counts = prefix_frequencies(queries, min_len=min_len, max_len=max_len)
    merged = merge_frequencies(state, new_counts)
    return merged, suggestions(merged, k=k)


def diff_suggestions(
    prev: DataFrame | None,
    cur: DataFrame,
    key_col: str = "prefix",
    payload_col: str = "completions_json",
) -> DataFrame:
    """Changed/new/deleted rows between two suggestion tables.

    This collapses the reference's MySQL→Debezium→Kafka CDC hop (SURVEY
    §3.3): instead of tailing a binlog to learn which prefixes changed,
    the engine diffs the staged tables directly and publishes ONLY the
    delta (to Kafka/Redis via sinks/). Output: (prefix, completions_json,
    op) with op ∈ {'upsert', 'delete'}; unchanged rows are absent.

    Both sides are (key, payload) projections, so the anti-joins shuffle
    only digests of the serving table, never the full corpus.
    """
    cur_kv = cur.select(F.col(key_col), F.col(payload_col))
    if prev is None:
        return cur_kv.withColumn("op", F.lit("upsert"))
    prev_kv = prev.select(F.col(key_col), F.col(payload_col))
    upserts = cur_kv.join(
        prev_kv, [key_col, payload_col], "left_anti"
    ).withColumn("op", F.lit("upsert"))
    deletes = (
        prev_kv.select(key_col)
        .join(cur_kv.select(key_col), key_col, "left_anti")
        .withColumn(payload_col, F.lit(None).cast("string"))
        .withColumn("op", F.lit("delete"))
    )
    return upserts.unionByName(deletes)


def run_incremental_batch(
    raw_lines: DataFrame,
    state_path: str | None,
    out_state_path: str,
    out_suggestions_path: str,
    k: int = 10,
) -> None:
    """Stage-then-swap batch runner over parquet state (H1/H2 discipline).

    The merged state is fully materialized to a NEW path before anything
    reads it back — the lineage of the suggestions job then reads the
    materialized copy, never a half-overwritten table. On object stores,
    swap = atomic pointer/manifest update; here, distinct per-batch paths.
    """
    spark = raw_lines.sparkSession
    state = spark.read.parquet(state_path) if state_path else None
    merged, _ = autocomplete_batch(raw_lines, state, k=k)
    merged.write.mode("overwrite").parquet(out_state_path)
    materialized = spark.read.parquet(out_state_path)
    suggestions(materialized, k=k).write.mode("overwrite").parquet(
        out_suggestions_path
    )
