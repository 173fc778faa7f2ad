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
    vt_type = dict(dim.dtypes)[valid_to]
    # ONE pass over the join (round 12 fifth session, guide §2.4): the
    # historical three-way routing (kept / closed / opened as separate
    # filters unioned back together) consumed `j` three times, so the
    # full-outer join AND everything under it (the dimension scan, the
    # update batch with its latest-per-key window) re-ran once per
    # branch. A row routes to at most TWO output versions (closed +
    # opened), so each j row emits a compacted array of version structs
    # and one explode replaces the three filter branches. Output rows
    # are identical (exceptAll 0 both ways; oracle hash-green ×3
    # scales on the scd2 caller).
    ver = lambda a_cols, vf, vt, cu: F.struct(  # noqa: E731
        *[c.alias(n) for c, n in zip(a_cols, attrs)],
        vf.alias(valid_from),
        vt.alias(valid_to),
        cu.alias(current_col),
    )
    cur_attrs = [F.col(a) for a in attrs]
    upd_attrs = [F.col(f"_u_{a}") for a in attrs]
    routed = F.array_compact(
        F.array(
            # current version survives: no update, or a no-op update
            F.when(
                has_cur & (~has_upd | ~changed),
                ver(cur_attrs, F.col(valid_from), F.col(valid_to), F.col(current_col)),
            ),
            # current version closed by a real change
            F.when(
                has_cur & has_upd & changed,
                ver(cur_attrs, F.col(valid_from), F.col("_u_ts"), F.lit(False)),
            ),
            # new open version: changed key, or brand-new key
            F.when(
                has_upd & (~has_cur | changed),
                ver(
                    upd_attrs,
                    F.col("_u_ts"),
                    F.lit(None).cast(vt_type),
                    F.lit(True),
                ),
            ),
        )
    )
    applied = j.select(*keys, F.explode(routed).alias("_v")).select(
        *keys,
        *[F.col(f"_v.{a}").alias(a) for a in attrs],
        F.col(f"_v.{valid_from}").alias(valid_from),
        F.col(f"_v.{valid_to}").alias(valid_to),
        F.col(f"_v.{current_col}").alias(current_col),
    )
    return hist.select(*keys, *attrs, valid_from, valid_to, current_col).unionByName(
        applied
    )
