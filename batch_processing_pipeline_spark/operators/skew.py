"""Skew mitigation: salted two-phase aggregation + salted replicated join.

At 100 TB the prefix distribution is Zipfian — a single hot key ("th…")
lands every row on one reducer. AQE's skew handling covers joins but not
aggregations with a single giant group; the classic fix is salting: append
a random-ish salt to the key, partially aggregate (key, salt), then
aggregate again on the key alone. Both aggregations combine map-side, so
the hot key's traffic is split across ``salt_buckets`` reducers in phase 1
and only ``salt_buckets`` pre-aggregated rows reach the phase-2 reducer.

The salt is derived from ``xxhash64`` over the ROW'S CONTENT (a
caller-supplied key column when available, else every column) — NOT from
``monotonically_increasing_id``/``rand``, which are assigned per task
attempt: under failure recovery a partially recomputed map stage would
re-salt surviving rows into different (key, salt) buckets than the shuffle
files already fetched, double-counting or dropping rows
(SPARK-23207-class hazard). A content hash is stable across retries, so
replayed tasks reproduce identical buckets. Rows with identical content
share a bucket — harmless for aggregation (their contributions combine
map-side anyway); uniformity suffers only if one group is dominated by
byte-identical rows.

Only algebraic aggregates (sum/count/min/max) decompose this way; use
two-level sketches for avg (sum+count) — provided as ``salted_avg``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _with_salt(
    df: DataFrame, salt_buckets: int, salt_key: Sequence[str] | None = None
) -> DataFrame:
    cols = list(salt_key) if salt_key else df.columns
    return df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(salt_buckets))
    )


def salted_sum(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    out_col: str | None = None,
    salt_buckets: int = 16,
    salt_key: Sequence[str] | None = None,
) -> DataFrame:
    """groupBy(group_cols).sum(value_col), skew-safe.

    ``salt_key``: columns whose content derives the salt (default: all) —
    pass a high-cardinality unique key when one exists.
    """
    out_col = out_col or f"sum_{value_col}"
    partial = (
        _with_salt(df, salt_buckets, salt_key)
        .groupBy(*group_cols, "_salt")
        .agg(F.sum(value_col).alias("_partial"))
    )
    return partial.groupBy(*group_cols).agg(F.sum("_partial").alias(out_col))


def salted_count(
    df: DataFrame,
    group_cols: Sequence[str],
    out_col: str = "n",
    salt_buckets: int = 16,
    salt_key: Sequence[str] | None = None,
) -> DataFrame:
    partial = (
        _with_salt(df, salt_buckets, salt_key)
        .groupBy(*group_cols, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
    )
    return partial.groupBy(*group_cols).agg(F.sum("_partial").cast("long").alias(out_col))


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    salt_key: Sequence[str] | None = None,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the FACT side, replicate the DIM side
    ``salt_buckets`` ×, join on (key, salt).

    A hot fact key ("null user", a celebrity id) lands all its rows on one
    reducer in a plain shuffled join; salting spreads them across
    ``salt_buckets`` reducers at the cost of shipping the dim relation
    ``salt_buckets`` × through the shuffle — the right trade when the dim
    side is small-ish but too big (or too many joins deep) to broadcast.
    AQE's skew-join split covers sort-merge joins at runtime; this explicit
    form works in every join mode and composes under further joins.

    ``salt_key`` names fact columns that VARY WITHIN a join key (a row id,
    a timestamp) — the salt must split a hot key's rows, so hashing the
    join key itself would be useless (one bucket per key).  The salt is
    content-derived (``xxhash64`` of those columns — NOT
    rand()/monotonically_increasing_id), so task retries reproduce
    identical buckets (SPARK-23207-class hazard, see module docstring).
    Default: every fact column.

    Dim replication uses ``explode(sequence(0 .. salt_buckets-1))`` —
    codegen, no Python.  Result equals ``fact.join(dim, on, how)`` exactly.

    Build strategy is SIZE-AWARE (round-12 — the fifth-decade harness
    caught the failure mode): a hard ``shuffle_hash`` hint makes each
    reducer hash-build ``|dim|·salt_buckets / shuffle.partitions`` rows,
    which GROWS with data at any fixed partition count — at sf10 (15M
    orders × 16 salts / 16 partitions) the build map OOMed
    (``SparkOutOfMemoryError: not enough memory to build hash map``),
    and a build-side OOM is not recoverable by AQE. The hint is now
    applied only when the optimizer's size estimate says the
    per-partition build fits (``_HASH_BUILD_BUDGET_BYTES``); above that
    the planner's default (sort-merge) takes over — it pays a sort but
    never OOMs, and AQE may still downgrade it to a hash join per
    partition where safe. Broadcasting remains deliberately unhinted:
    a broadcast join has no reducer skew to cure, and the replicated
    build side is ``salt_buckets`` × the memory.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left")
    f_salted = _with_salt(fact, salt_buckets, salt_key)
    d_replicated = dim.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast("array<long>")),
    )
    if _hash_build_fits(dim, salt_buckets):
        d_replicated = d_replicated.hint("shuffle_hash")
    return f_salted.join(d_replicated, [on, "_salt"], how).drop("_salt")


#: per-reducer hash-build budget for the salted dim slice, in IN-MEMORY
#: bytes (UnsafeHashedRelation), kept well under a per-task execution
#: memory share
_HASH_BUILD_BUDGET_BYTES = 256 * 1024 * 1024

#: optimizer sizeInBytes → in-memory hash-relation inflation. The
#: estimate is COMPRESSED COLUMNAR bytes (parquet stats); the build is
#: UnsafeRow + open-addressing map overhead. Measured at sf10: a 79 MB
#: estimate (15M two-column orders rows) OOMed a >1.1 GB build — ~14×;
#: 16× adds margin.
_HASH_BUILD_INFLATION = 16


def _hash_build_fits(dim: DataFrame, salt_buckets: int) -> bool:
    """True when the replicated dim's PER-REDUCER slice fits a hash build.

    Uses the optimizer's size estimate (parquet stats / logical-plan
    sizeInBytes — no action) × the measured columnar→hash-relation
    inflation, divided across ``spark.sql.shuffle.partitions``. On any
    stats failure the answer is True (the historical hint behavior)."""
    try:
        spark = dim.sparkSession
        size = int(
            str(
                dim._jdf.queryExecution()  # noqa: SLF001
                .optimizedPlan()
                .stats()
                .sizeInBytes()
            )
        )
        parts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    except Exception:  # noqa: BLE001
        return True
    per_part = size * salt_buckets / max(parts, 1)
    return per_part * _HASH_BUILD_INFLATION < _HASH_BUILD_BUDGET_BYTES


def salted_avg(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    out_col: str | None = None,
    salt_buckets: int = 16,
    salt_key: Sequence[str] | None = None,
) -> DataFrame:
    """Average decomposed as (sum, count) pairs through the salt level."""
    out_col = out_col or f"avg_{value_col}"
    partial = (
        _with_salt(df, salt_buckets, salt_key)
        .groupBy(*group_cols, "_salt")
        .agg(
            F.sum(value_col).alias("_s"),
            F.count(value_col).alias("_c"),
        )
    )
    return partial.groupBy(*group_cols).agg(
        (F.sum("_s") / F.sum("_c")).alias(out_col)
    )