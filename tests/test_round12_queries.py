"""Round-12 registry additions: semantic invariants beyond the DuckDB
hash-match (which tools/check_oracle.py covers tri-scale), plus
constructed-input goldens where the expected values are hand-computable."""

from __future__ import annotations

import datetime

import pyspark.sql.functions as F

from batch_processing_pipeline_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------- markov_transitions


def test_markov_rows_normalize_to_one(spark):
    rows = QUERIES["markov_transitions"](spark, SF).collect()
    assert rows, "no transitions on the fixture"
    by_from: dict[str, float] = {}
    for r in rows:
        assert r.n >= 1
        assert 0.0 < r.p <= 1.0
        by_from[r.from_type] = by_from.get(r.from_type, 0.0) + r.p
    # each from-row of the transition matrix sums to 1 (round4 tolerance
    # accumulates across <= |types| cells)
    for from_type, total in by_from.items():
        assert abs(total - 1.0) < 5e-4, (from_type, total)


def test_markov_transition_count_conservation(spark):
    # sum of transition counts == (events with a predecessor) ==
    # total non-null-type events minus one per active user
    rows = QUERIES["markov_transitions"](spark, SF).collect()
    got = sum(r.n for r in rows)
    from batch_processing_pipeline_spark.registry._base import _events

    e = _events(spark, SF).where(F.col("event_type").isNotNull())
    n_events = e.count()
    n_users = e.select("user_id").distinct().count()
    assert got == n_events - n_users


def test_markov_golden_constructed(spark):
    # user 1: a -> b -> a   (a->b, b->a);  user 2: a -> a  (a->a)
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1, "a"),
        (2, t0 + datetime.timedelta(minutes=1), 1, "b"),
        (3, t0 + datetime.timedelta(minutes=2), 1, "a"),
        (4, t0, 2, "a"),
        (5, t0 + datetime.timedelta(minutes=1), 2, "a"),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, event_type string")
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        # the registry reads events from <sf>/events.parquet
        df.write.parquet(os.path.join(d, "events.parquet"))
        got = {
            (r.from_type, r.to_type): (r.n, r.p)
            for r in QUERIES["markov_transitions"](spark, d).collect()
        }
    assert got == {
        ("a", "b"): (1, 0.5),
        ("a", "a"): (1, 0.5),
        ("b", "a"): (1, 1.0),
    }


# --------------------------------------------------------- series_autocorr


def test_autocorr_shape_and_bounds(spark):
    rows = QUERIES["series_autocorr"](spark, SF).collect()
    types = {r.event_type for r in rows}
    # every (type, lag) cell present: fixture spans 30 days, so lag 7
    # still leaves 23 aligned pairs
    assert len(rows) == len(types) * 7
    for r in rows:
        assert 1 <= r.lag_k <= 7
        assert r.n_pairs >= 2
        if r.acf is not None:
            assert -1.0 - 5e-5 <= r.acf <= 1.0 + 5e-5


def test_autocorr_golden_alternating_series(spark):
    # one type, daily counts alternating 1,2,1,2,... over 8 days:
    # lag-1 ACF = -1, lag-2 ACF = +1 (perfect anti/auto correlation)
    t0 = datetime.datetime(2024, 1, 1, 12)
    rows = []
    eid = 0
    for day in range(8):
        for _ in range(1 if day % 2 == 0 else 2):
            rows.append((eid, t0 + datetime.timedelta(days=day), 1, "x"))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, event_type string")
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "events.parquet"))
        got = {
            r.lag_k: (r.n_pairs, r.acf)
            for r in QUERIES["series_autocorr"](spark, d).collect()
        }
    assert got[1] == (7, -1.0)
    assert got[2] == (6, 1.0)
