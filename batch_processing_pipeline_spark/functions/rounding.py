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
