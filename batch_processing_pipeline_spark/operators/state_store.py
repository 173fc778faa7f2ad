"""Bucketed cumulative state store + join-based incremental merge.

The union+re-aggregate merge (``merge_frequencies``, mirroring the
reference) reshuffles the ENTIRE accumulated state every batch — fine when
state is small, wrong at 100 TB where state ≫ batch delta. The scale form:

* persist state as a table **bucketed by the merge key** — each batch then
  reads it already partitioned, no exchange on the state side;
* merge as a **full outer join** on the key: only the (small) delta
  shuffles, and ``coalesce(state,0) + coalesce(delta,0)`` resolves both
  sides — the carry-forward rows and brand-new rows come for free from the
  outer join semantics.

Bucketing uses the session catalog (``saveAsTable`` + ``bucketBy``); on a
real deployment the warehouse dir is the object store and bucket count is
sized so each bucket file stays in the 100 MB–1 GB sweet spot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def save_state_bucketed(
    df: DataFrame,
    table: str,
    buckets: int = 16,
    key_cols: tuple[str, str] = ("prefix", "query"),
) -> None:
    """Write cumulative state as a parquet table bucketed by the merge key."""
    (
        df.write.format("parquet")
        .mode("overwrite")
        .bucketBy(buckets, *key_cols)
        .sortBy(*key_cols)
        .saveAsTable(table)
    )


def merge_frequencies_join(
    state: DataFrame,
    new_counts: DataFrame,
    key_cols: tuple[str, str] = ("prefix", "query"),
    freq_col: str = "frequency",
) -> DataFrame:
    """Outer-join merge: state' = state ⟗ delta with summed frequencies.

    Equivalent to the union+agg merge (asserted in tests) but only the
    delta side needs a shuffle when ``state`` comes from a table bucketed
    on ``key_cols``.
    """
    keys = list(key_cols)
    s = state.select(*keys, F.col(freq_col).cast("long").alias("_s"))
    n = new_counts.select(*keys, F.col(freq_col).cast("long").alias("_n"))
    return s.join(n, keys, "full_outer").select(
        *keys,
        (F.coalesce(F.col("_s"), F.lit(0)) + F.coalesce(F.col("_n"), F.lit(0))).alias(
            freq_col
        ),
    )


def run_bucketed_batch(
    spark: SparkSession,
    new_counts: DataFrame,
    state_table: str,
    out_table: str,
    buckets: int = 16,
) -> DataFrame:
    """One incremental merge against a bucketed state table.

    Reads ``state_table`` (bucketed; absent → first batch), join-merges the
    delta, writes ``out_table`` bucketed the same way (stage-then-swap: the
    output table is distinct from the input table, so a failed batch never
    corrupts current state). Returns the merged frame (lazily re-read).
    """
    if out_table == state_table:
        # the merged plan reads state_table LAZILY while saveAsTable
        # overwrites it — writing in place corrupts current state
        raise ValueError(
            "out_table must differ from state_table (stage-then-swap): "
            f"both are {state_table!r}"
        )
    if spark.catalog.tableExists(state_table):
        state = spark.table(state_table)
        merged = merge_frequencies_join(state, new_counts)
    else:
        merged = new_counts.select(
            "prefix", "query", F.col("frequency").cast("long").alias("frequency")
        )
    save_state_bucketed(merged, out_table, buckets=buckets)
    return spark.table(out_table)
