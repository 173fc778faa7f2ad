"""Cross-engine-stable rounding for compared float outputs.

``ROUND(x, 4)`` is not portable at half-way boundaries: Spark rounds the
exact decimal expansion of the double (BigDecimal HALF_UP), while engines
that compute ``round(x*10^4)/10^4`` see the double-*multiplication* of x,
which can land exactly on .5 when the exact expansion is just below it
(observed: quality=0.82624999... → Spark 0.8262, DuckDB 0.8263).

``round4`` pins ONE formula — ``floor(x·10⁴ + 0.5)/10⁴`` — that both the
engine queries and the DuckDB oracle SQL use verbatim, so equal input
doubles always produce equal rounded outputs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round4(col: Column) -> Column:
    """Portable 4-decimal rounding (half-up toward +inf), double result."""
    return F.floor(col * F.lit(10000.0) + F.lit(0.5)) / F.lit(10000.0)


def sql_round4(expr: str) -> str:
    """The identical formula in SQL text (oracle queries AND spark.sql).

    Every constant is cast to DOUBLE explicitly: bare ``10000.0`` parses as
    a DECIMAL literal in Spark SQL (unlike ``F.lit``), and
    ``bigint / decimal`` division yields DECIMAL — silently changing the
    output type and value hash.
    """
    return (
        f"floor(({expr}) * CAST(10000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE))"
        " / CAST(10000.0 AS DOUBLE)"
    )


# ---------------------------------------------------------------------------
# Exact-money arithmetic (the repo-wide sweep of the dq20/rfm lesson).
#
# A double SUM over a 2-decimal money column is partial-sum-ORDER-dependent:
# Spark's partition/merge order and DuckDB's sequential order associate the
# float additions differently, and the divergence grows with group size —
# proven to cross the round4 boundary at sf1 (rfm_scores) and sf10
# (dq20_datetime). The portable form sums EXACT INTEGER CENTS (associative,
# order-free), so both engines agree bit-for-bit at every scale.
#
# ``cents`` uses round-to-NEAREST, not ``floor(x·100 + 0.5)``: a stored
# 2-decimal value is within ~1e-8 of an integer after ×100, so any
# nearest-rounding recovers it exactly — and unlike the floor form it is
# SIGN-SAFE (floor(-1.005·100 + 0.5) = -101; negative balances exist in
# c_acctbal). Ties never occur, so Spark's HALF_UP and C-library
# half-away-from-zero agree.
#
# Headroom contract (documented, checked per site): the long cents sum is
# exact while Σ|cents| < 2^63 ≈ 9.2e18 — ~9e16 dollars, thousands of SFs
# for any per-group money sum in this schema. Derived units (1e-4 dollars
# for extendedprice·(1−discount), 1e-6 for the q1 charge) tighten that to
# ~sf50-per-global-group for the worst case (charge); sites that could
# exceed it sum DECIMAL(38,0) instead. The final long→double conversion and
# one division are each correctly rounded in BOTH engines, so the output
# double is identical (decimal/int128→double paths may differ by 1 ulp —
# only used where the value is then divided by a same-unit total, where
# 1 ulp cannot cross a round4 boundary that matters).
# ---------------------------------------------------------------------------


def cents(col: Column) -> Column:
    """Exact integer cents (long) of a 2-decimal money double. Sign-safe.

    Pure-double arithmetic, deliberately NOT ``F.round``: Spark's Round
    on DoubleType allocates a java.math.BigDecimal per row (measured
    ~2× on the q1 scan at bench scale). ``floor(m+0.5)`` /
    ``-floor(0.5-m)`` is branch + float ops inside whole-stage codegen
    and rounds half-AWAY-FROM-ZERO like DuckDB's ROUND — and under the
    2-decimal-input precondition ties never occur, so the half-rule is
    moot and both engines recover the identical integer.
    """
    m = col * F.lit(100.0)
    return (
        F.when(col < 0, -F.floor(F.lit(0.5) - m))
        .otherwise(F.floor(m + F.lit(0.5)))
        .cast("long")
    )


def sql_cents(expr: str) -> str:
    """The identical cents formula in DuckDB/ANSI SQL text."""
    return f"CAST(ROUND(({expr}) * CAST(100.0 AS DOUBLE)) AS BIGINT)"


def sum_money(col: Column) -> Column:
    """Order-free SUM of a 2-decimal money column, returned as dollars."""
    return F.sum(cents(col)) / F.lit(100.0)


def sql_sum_money(expr: str) -> str:
    """The identical exact money-sum in SQL text (DuckDB oracle side)."""
    return f"(SUM({sql_cents(expr)}) / CAST(100.0 AS DOUBLE))"
