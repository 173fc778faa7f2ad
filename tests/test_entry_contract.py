"""Driver-contract invariants for __spark_entry__ (no Spark session needed).

The driver records a fixed-size correctness window from the FRONT of
``queries()``; these guards keep the ordering contract honest as the
registry grows — a regression here silently wastes a whole round of
driver evidence (the round-3 and round-6 lessons).
"""

from __future__ import annotations

import importlib.util
import os

_here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _entry():
    spec = importlib.util.spec_from_file_location(
        "spark_entry_under_test", os.path.join(_here, "__spark_entry__.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_window_queries_exist_and_are_oracle_able():
    m = _entry()
    q, o = m.queries(), m.oracle_sql()
    window = list(q)[: len(m._WINDOW_R7)]
    assert window == [n for n in m._WINDOW_R7 if n in q]
    missing = [n for n in window if n not in o]
    assert not missing, f"window slots wasted on rows-only queries: {missing}"


def test_every_query_has_oracle_or_documented_rows_only():
    from batch_processing_pipeline_spark.registry import ORACLES, QUERIES

    assert set(ORACLES) == set(QUERIES)
    rows_only = {n for n, sql in ORACLES.items() if sql is None}
    # rows-only is a deliberate, bounded design decision (hash-unstable /
    # approximate / iterative-stateful ops pinned in pytest instead);
    # growing this set should be a conscious act, not drift
    assert len(rows_only) <= 20, sorted(rows_only)


def test_prior_green_and_window_are_disjoint():
    m = _entry()
    overlap = set(m._WINDOW_R7) & m._PRIOR_GREEN
    assert not overlap, f"already-verified queries re-occupying slots: {overlap}"


def test_oracle_sql_is_subset_of_queries():
    m = _entry()
    assert set(m.oracle_sql()) <= set(m.queries())
