"""Query normalization + prefix fan-out — the reference's signature operators.

Reference behavior (``IncrementalAutocomplete.java``):

* ``:66-67``  filter: keep lines with ``trim(line).length >= 2``
* ``:68-69``  map: ``trim().toLowerCase()``
* ``:72-79``  RDD flatMap: for each query ``q`` emit
  ``(substring(q, 0, L), q, 1)`` for ``L = 2 .. min(len(q), 60)``

The reference drops out of the DataFrame API into a Java RDD for the fan-out,
which makes the fan-out opaque to Catalyst (no pushdown, no codegen through
it). Here the fan-out is a pure column expression —
``explode(transform(sequence(...)))`` — so the whole plan stays inside
whole-stage codegen and scales linearly with no Python or closure overhead.

Scale notes (100 TB): the fan-out amplifies rows ×(min(len,60)−1) BEFORE the
first aggregation, but Spark plans a partial (map-side) aggregate directly on
the generator output, so the shuffle carries only distinct
``(prefix, query)`` pairs per task — the amplification never crosses the
network un-combined.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Reference caps: prefix length ≤ 60 (VARCHAR(60) DDL,
#: ``approach 4 cli insturctions.txt:43``), query length ≤ 500 (VARCHAR(500),
#: hazard H10 — the reference never enforced the query cap; we do).
DEFAULT_MIN_PREFIX_LEN = 2
DEFAULT_MAX_PREFIX_LEN = 60
DEFAULT_MAX_QUERY_LEN = 500


def normalize_queries(
    df: DataFrame,
    text_col: str = "value",
    out_col: str = "query",
    min_len: int = DEFAULT_MIN_PREFIX_LEN,
    max_query_len: int = DEFAULT_MAX_QUERY_LEN,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """``lower(trim(x))`` + drop blank/too-short lines + cap query length.

    Mirrors ``IncrementalAutocomplete.java:66-69`` with the H10 fix (queries
    longer than the serving column are truncated instead of overflowing).
    """
    q = F.lower(F.trim(F.col(text_col)))
    return (
        df.where(F.col(text_col).isNotNull())
        .where(F.length(F.trim(F.col(text_col))) >= min_len)
        .select(
            *[F.col(c) for c in carry_cols],
            F.substring(q, 1, max_query_len).alias(out_col),
        )
    )


def prefix_array(
    query: Column,
    min_len: int = DEFAULT_MIN_PREFIX_LEN,
    max_len: int = DEFAULT_MAX_PREFIX_LEN,
) -> Column:
    """Array of prefixes ``substr(q, 1, L)`` for ``L = min_len..min(len, max_len)``.

    Empty array when the query is shorter than ``min_len`` (guards against
    ``sequence(2, 1)`` producing a *descending* sequence).
    """
    lengths = F.sequence(F.lit(min_len), F.least(F.length(query), F.lit(max_len)))
    return F.when(
        F.length(query) >= F.lit(min_len),
        F.transform(lengths, lambda i: query.substr(F.lit(1), i)),
    ).otherwise(F.array().cast("array<string>"))


def expand_prefixes(
    df: DataFrame,
    query_col: str = "query",
    prefix_col: str = "prefix",
    min_len: int = DEFAULT_MIN_PREFIX_LEN,
    max_len: int = DEFAULT_MAX_PREFIX_LEN,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Fan each query out into all of its character prefixes.

    Column-expression re-expression of the reference's RDD flatMap
    (``IncrementalAutocomplete.java:72-79``); output columns
    ``(*carry_cols, prefix, <query_col>)``, one row per (prefix, query)
    occurrence.
    """
    return df.select(
        *[F.col(c) for c in carry_cols],
        F.explode(prefix_array(F.col(query_col), min_len, max_len)).alias(prefix_col),
        F.col(query_col),
    )


def prefix_frequencies(
    df: DataFrame,
    query_col: str = "query",
    prefix_col: str = "prefix",
    freq_col: str = "frequency",
    min_len: int = DEFAULT_MIN_PREFIX_LEN,
    max_len: int = DEFAULT_MAX_PREFIX_LEN,
) -> DataFrame:
    """Normalized queries → ``(prefix, query, frequency)`` counts.

    Combines the fan-out with the first hash aggregation
    (``IncrementalAutocomplete.java:87-88``). ``frequency`` is LongType
    end-to-end (H8 fix: the reference narrowed to a MySQL INT column).
    """
    return (
        expand_prefixes(df, query_col, prefix_col, min_len, max_len)
        .groupBy(prefix_col, query_col)
        .agg(F.count(F.lit(1)).alias(freq_col))
    )
