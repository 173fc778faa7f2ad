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
    """Front-of-ordering slots (what the driver's 50-row window lands on)
    must hold oracle-able queries the driver has NOT yet verified green —
    the self-rotation contract. Never pins the literal curated list: that
    changes every round by design."""
    m = _entry()
    q, o = m.queries(), m.oracle_sql()
    verdicts = m._driver_verdicts()
    # once fewer than 50 non-green oracle-able queries remain, the front
    # necessarily refills with greens — only the genuinely-rotatable
    # prefix is under contract
    n_rotatable = sum(
        1 for n in q if n in o and verdicts.get(n) is not True
    )
    front = list(q)[: min(50, n_rotatable)]
    missing = [n for n in front if n not in o]
    assert not missing, f"window slots wasted on rows-only queries: {missing}"
    wasted = [n for n in front if verdicts.get(n) is True]
    assert not wasted, f"window slots re-proving driver-green queries: {wasted}"


def test_self_rotation_demotes_greens_and_resurfaces_reds(tmp_path, monkeypatch):
    """Simulate the next round: a committed CORRECTNESS file marking the
    current window green (with one red) must rotate the greens out and
    put the red FIRST — with no manual edit."""
    import json
    import shutil

    m = _entry()
    front = list(m.queries())[:50]
    clone = tmp_path / "repo"
    clone.mkdir()
    shutil.copy(os.path.join(_here, "__spark_entry__.py"), clone / "__spark_entry__.py")
    fake = {
        n: {"rows_match": True, "schema_match": True, "hash_match": True}
        for n in front
    }
    fake[front[3]] = {"rows_match": True, "schema_match": True, "hash_match": False}
    (clone / "CORRECTNESS_r98.json").write_text(json.dumps(fake))

    spec = importlib.util.spec_from_file_location(
        "spark_entry_rotated", str(clone / "__spark_entry__.py")
    )
    m2 = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m2)
    rotated = list(m2.queries())
    assert rotated[0] == front[3], "red row must re-enter the window first"
    greens = set(front) - {front[3]}
    assert not greens & set(rotated[:40]), "driver-green queries must demote"


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
