"""Bucketed (sort-merge-bucket) table layout: shuffle once at write time,
then join forever without an Exchange.

The reference pipeline re-reads its MySQL tables every 5-minute batch and
joins them in-engine (SURVEY.md §2.1 #7/#10); at 100 TB the equivalent is a
fact/dim pair that is joined on the same key every batch.  Spark's answer is
*bucketing*: `bucketBy(n, key)` + `sortBy(key)` at write time hash-partitions
and pre-sorts the files, and every later equi-join (or aggregation) on that
key reads the buckets co-located — the per-batch shuffle disappears from the
plan entirely (no `Exchange`, and with `sortBy` no per-batch `Sort` either).
That converts an O(data) shuffle *per query* into a one-time O(data) layout
cost, exactly the trade a 5-minute cron amortizes thousands of times over.

Design notes for the 100-TB shape:
- Bucket counts must MATCH on both sides (or be a multiple with
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``); we default both
  sides to the same ``num_buckets``.
- Each bucket should land in executor memory: pick
  ``num_buckets ≈ table_bytes / 256 MiB`` at the target scale.
- Bucketed tables must be saved through the catalog (``saveAsTable``) so the
  bucketing metadata survives; a plain ``parquet(path)`` write silently drops
  it.  We register them as EXTERNAL tables via ``option("path", ...)`` so the
  data lives wherever the caller wants (object store at scale).
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: Sequence[str],
    num_buckets: int,
    sort_cols: Sequence[str] | None = None,
    reuse: bool = False,
) -> None:
    """Write ``df`` as an external bucketed (and optionally sorted) table.

    Overwrites both the catalog entry and the files so repeated calls in one
    session (e.g. every driver correctness run) are idempotent.  With
    ``reuse=True`` an existing catalog entry is kept as-is — the layout IS
    the amortized asset, so re-deriving it on every query of a session
    would charge the one-time cost N times. Reuse requires the existing
    table's bucket spec AND storage location to match the request (a
    matching-spec table at a different path holds different data);
    data-staleness at the SAME path is intentionally not detected —
    callers that may feed changed data must leave ``reuse`` off.
    """
    spark = df.sparkSession
    if reuse and spark.catalog.tableExists(table):
        if _bucket_spec_matches(
            spark, table, bucket_cols, num_buckets, sort_cols, path
        ):
            return
        # stale layout (different bucket count/keys/sort/location):
        # silently reusing it would break the no-Exchange property (or
        # return another dataset's rows) — rewrite
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    writer = (
        df.write.mode("overwrite")
        .option("path", os.path.abspath(path))
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def _bucket_spec_matches(
    spark: SparkSession,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int,
    sort_cols: Sequence[str] | None,
    path: str | None = None,
) -> bool:
    """True iff the catalog table's bucketing metadata equals the request
    (including, when ``path`` is given, the storage Location — a matching
    spec pointing at a different directory is a different dataset)."""
    rows = spark.sql(f"DESCRIBE EXTENDED {table}").collect()
    meta = {r["col_name"]: (r["data_type"] or "") for r in rows}

    def cols(field: str) -> list[str]:
        raw = meta.get(field, "")
        return [c.strip().strip("`") for c in raw.strip("[]").split(",") if c.strip()]

    if path is not None:
        loc = meta.get("Location", "").strip()
        want = os.path.abspath(path)
        # catalog reports a URI (file:/...); compare filesystem paths
        if loc.startswith("file:"):
            loc = loc[len("file:"):]
        if os.path.abspath(loc) != want:
            return False

    return (
        meta.get("Num Buckets", "").strip() == str(num_buckets)
        and cols("Bucket Columns") == list(bucket_cols)
        and cols("Sort Columns") == list(sort_cols or [])
    )


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two catalog tables bucketed on ``on``.

    When both tables were written with :func:`write_bucketed` on the join
    key with equal bucket counts, the physical plan contains NO Exchange on
    either side (asserted in tests/test_bucketed.py) — the join streams
    bucket i of the left against bucket i of the right.
    """
    return spark.table(left_table).join(spark.table(right_table), list(on), how)
