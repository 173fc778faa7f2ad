"""SCD2 versioned-dimension apply: routing, latest-wins, no-op suppression."""

from __future__ import annotations

import datetime

from batch_processing_pipeline_spark.operators.scd import scd2_apply

DIM_SCHEMA = (
    "k long, name string, bal double, valid_from timestamp, "
    "valid_to timestamp, is_current boolean"
)
UPD_SCHEMA = "k long, name string, bal double, ts timestamp"

T0 = datetime.datetime(1970, 1, 1)
T1 = datetime.datetime(2024, 1, 1)
T2 = datetime.datetime(2024, 1, 2)


def test_scd2_routing(spark):
    dim = spark.createDataFrame(
        [
            # k=1: has history + a current row that will change
            (1, "ann", 10.0, T0, T1, False),
            (1, "ann", 20.0, T1, None, True),
            # k=2: current row, update is a no-op
            (2, "bob", 5.0, T0, None, True),
            # k=3: current row, no update at all
            (3, "cat", 7.0, T0, None, True),
        ],
        DIM_SCHEMA,
    )
    upd = spark.createDataFrame(
        [
            (1, "ann", 25.0, T1),   # stale update — must LOSE to the T2 one
            (1, "ann", 30.0, T2),   # latest wins
            (2, "bob", 5.0, T2),    # identical attrs — no new version
            (4, "dan", 1.0, T2),    # brand-new key
        ],
        UPD_SCHEMA,
    )
    out = scd2_apply(dim, upd, ["k"], ["name", "bal"])
    rows = {(r.k, r.valid_from, r.valid_to): (r.name, r.bal, r.is_current) for r in out.collect()}
    assert len(rows) == 6
    # history untouched
    assert rows[(1, T0, T1)] == ("ann", 10.0, False)
    # old current closed at the WINNING update's ts
    assert rows[(1, T1, T2)] == ("ann", 20.0, False)
    # new open version carries the latest attrs
    assert rows[(1, T2, None)] == ("ann", 30.0, True)
    # no-op update: single unchanged open row
    assert rows[(2, T0, None)] == ("bob", 5.0, True)
    # untouched key passes through
    assert rows[(3, T0, None)] == ("cat", 7.0, True)
    # new key opens at its update ts
    assert rows[(4, T2, None)] == ("dan", 1.0, True)


def test_scd2_idempotent_reapply(spark):
    """Re-applying the same batch to the post-batch dimension changes
    nothing — every update is now a no-op against the open versions."""
    dim = spark.createDataFrame([(1, "ann", 20.0, T0, None, True)], DIM_SCHEMA)
    upd = spark.createDataFrame([(1, "ann", 30.0, T2)], UPD_SCHEMA)
    once = scd2_apply(dim, upd, ["k"], ["name", "bal"])
    twice = scd2_apply(once, upd, ["k"], ["name", "bal"])
    a = sorted(map(tuple, once.collect()))
    b = sorted(map(tuple, twice.collect()))
    assert a == b


def test_scd2_null_safe_change_detection(spark):
    """NULL attributes route through the single-pass version array
    correctly (round-12 rewrite): null -> value is a CHANGE, null -> null
    is a NO-OP (eqNullSafe, not =)."""
    dim = spark.createDataFrame(
        [
            (1, None, 10.0, T0, None, True),   # null name, update fills it
            (2, None, 5.0, T0, None, True),    # null name, update keeps null
        ],
        DIM_SCHEMA,
    )
    upd = spark.createDataFrame(
        [(1, "ann", 10.0, T2), (2, None, 5.0, T2)], UPD_SCHEMA
    )
    out = scd2_apply(dim, upd, ["k"], ["name", "bal"])
    rows = {(r.k, r.valid_from, r.valid_to): (r.name, r.bal, r.is_current) for r in out.collect()}
    assert len(rows) == 3
    assert rows[(1, T0, T2)] == (None, 10.0, False)   # closed
    assert rows[(1, T2, None)] == ("ann", 10.0, True)  # opened with new attr
    assert rows[(2, T0, None)] == (None, 5.0, True)    # no-op: untouched
