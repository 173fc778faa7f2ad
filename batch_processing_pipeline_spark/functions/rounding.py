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
    """The identical formula in SQL text, for oracle queries."""
    return f"floor(({expr}) * 10000.0 + 0.5) / 10000.0"
