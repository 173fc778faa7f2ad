"""Property tests for the portable round4 contract (functions/rounding.py).

Every compared float in the repo flows through ONE formula —
``floor(x*10^4 + 0.5)/10^4`` — on the Spark side, the DuckDB-oracle
side, and the python references in tests. These properties pin that the
three evaluations of the formula agree on arbitrary doubles (including
exact half-way points, where engine-native ROUND(x, 4) is documented to
drift), using an in-process DuckDB as the SQL evaluator — no Spark
session needed, so the property runs at hypothesis speed.
"""

from __future__ import annotations

import math

import duckdb
from hypothesis import given, settings, strategies as st

from batch_processing_pipeline_spark.functions.rounding import sql_round4

_con = duckdb.connect()


def py_round4(x: float) -> float:
    return math.floor(x * 10000.0 + 0.5) / 10000.0


def duck_round4(x: float) -> float:
    (v,) = _con.execute(
        f"SELECT {sql_round4('CAST(? AS DOUBLE)')}", [x]
    ).fetchone()
    return v


@settings(max_examples=300)
@given(st.floats(min_value=-1e9, max_value=1e9, allow_nan=False))
def test_round4_python_and_duckdb_agree(x):
    assert duck_round4(x) == py_round4(x)


@given(st.integers(min_value=-10_000_000, max_value=10_000_000))
def test_round4_half_way_class_agrees_across_engines(k):
    """x = (k + 0.5)/10^4 — the half-way class where engine-native
    ROUND(x, 4) implementations disagree. The formula's contract is NOT
    decimal-exact half-up (the double representation of x decides which
    side of .5 the product lands on — that's unavoidable); the contract
    is that BOTH evaluators land on the SAME side, which is exactly what
    makes the hash comparison engine-portable."""
    x = (k + 0.5) / 10000.0
    assert duck_round4(x) == py_round4(x)
    # and the result is one of the two adjacent 1e-4 grid points
    assert abs(py_round4(x) * 10000.0 - k) <= 1.0 + 1e-9


@given(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False))
def test_round4_is_idempotent(x):
    once = py_round4(x)
    assert py_round4(once) == once
    assert duck_round4(once) == once
