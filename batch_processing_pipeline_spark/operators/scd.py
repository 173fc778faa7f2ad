"""Slowly-changing-dimension type 2: versioned dimension maintenance.

The reference ships row changes through Debezium CDC into serving stores
(docker-compose.yml:126-184) — a type-1 overwrite world. Warehouses that
must answer "what did this row look like when the order shipped?" keep
type-2 history instead: every change CLOSES the current version
(``valid_to`` = change time) and OPENS a new one. This operator applies
one batch of updates to such a dimension declaratively.

Scale: one window over the (small) update batch picks the latest update
per key; one full-outer join between CURRENT rows and that delta does all
the routing — history rows pass through untouched. With the dimension
stored bucketed by key (operators/state_store.py pattern) the join
exchanges only the delta side; nothing in the plan scales with history
size except the passthrough scan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str],
    attr_cols: Sequence[str],
    ts_col: str = "ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Apply ``updates`` (key, attrs, ts) to a type-2 dimension.

    ``dim`` schema: key_cols + attr_cols + (valid_from, valid_to,
    is_current); open rows have ``valid_to`` null and ``is_current`` true.

    Batch semantics: the LATEST update per key wins (ROW_NUMBER over ts
    DESC — deterministic). Routing, all null-safe on attributes:

    * current row + update with DIFFERENT attrs → row closed at update ts,
      new open row inserted;
    * current row + update with identical attrs → no-op (no spurious
      version);
    * update for an unseen key → new open row;
    * current row without update, and ALL history rows → pass through.
    """
    keys = list(key_cols)
    attrs = list(attr_cols)
    w = Window.partitionBy(*keys).orderBy(F.desc(ts_col))
    latest = (
        updates.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    cur = dim.where(F.col(current_col))
    hist = dim.where(~F.col(current_col))
    u = latest.select(
        *keys,
        *[F.col(a).alias(f"_u_{a}") for a in attrs],
        F.col(ts_col).alias("_u_ts"),
    )
    j = cur.join(u, keys, "full_outer")
    has_cur = F.col(valid_from).isNotNull()
    has_upd = F.col("_u_ts").isNotNull()
    changed = ~F.lit(True)
    for a in attrs:
        changed = changed | ~F.col(a).eqNullSafe(F.col(f"_u_{a}"))
    # current version survives: no update, or update that changes nothing
    kept = j.where(has_cur & (~has_upd | ~changed)).select(
        *keys, *attrs, valid_from, valid_to, current_col
    )
    # current version closed by a real change
    closed = j.where(has_cur & has_upd & changed).select(
        *keys,
        *attrs,
        F.col(valid_from),
        F.col("_u_ts").alias(valid_to),
        F.lit(False).alias(current_col),
    )
    # new open version: changed key, or brand-new key
    opened = j.where(has_upd & (~has_cur | changed)).select(
        *keys,
        *[F.col(f"_u_{a}").alias(a) for a in attrs],
        F.col("_u_ts").alias(valid_from),
        F.lit(None).cast(dict(dim.dtypes)[valid_to]).alias(valid_to),
        F.lit(True).alias(current_col),
    )
    return hist.select(*keys, *attrs, valid_from, valid_to, current_col).unionByName(
        kept
    ).unionByName(closed).unionByName(opened)
