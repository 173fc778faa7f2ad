"""Incremental frequency merge — the reference's cumulative-state step, done right.

Reference (``IncrementalAutocomplete.java:100-107``): union the new batch
counts with the previous ``prefix_query_frequency`` table and re-sum. Two
hazards fixed here:

* H1 — the reference never cached the merged frame; its second action
  re-read the *already overwritten* state table and double-counted the new
  batch. This operator is a pure function ``(state, new) -> state'`` — the
  caller persists ``state'`` exactly once (see plans/autocomplete.py, which
  stages the merged result before any sink touches the old state).
* H8 — counts stay LongType end-to-end (the reference narrowed to MySQL INT).

Scale notes: both inputs are pre-aggregated on (prefix, query), so the merge
is one hash aggregation over their union — partial aggregation combines
map-side and only distinct keys shuffle. At 100 TB of accumulated state the
state table should be bucketed/partitioned by ``prefix`` so the union-agg
reuses its layout instead of reshuffling the full history each batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_frequencies(
    state: DataFrame | None,
    new_counts: DataFrame,
    key_cols: tuple[str, str] = ("prefix", "query"),
    freq_col: str = "frequency",
) -> DataFrame:
    """Merge new (prefix, query, frequency) counts into cumulative state.

    ``state`` may be None (first batch). Both inputs must have exactly
    ``(*key_cols, freq_col)`` semantics; output has the same shape with
    summed frequencies, LongType.
    """
    cols = [*key_cols, freq_col]
    new_counts = new_counts.select(*cols).withColumn(
        freq_col, F.col(freq_col).cast("long")
    )
    if state is None:
        return new_counts
    state = state.select(*cols).withColumn(freq_col, F.col(freq_col).cast("long"))
    return (
        state.unionByName(new_counts)
        .groupBy(*key_cols)
        .agg(F.sum(freq_col).alias(freq_col))
    )
