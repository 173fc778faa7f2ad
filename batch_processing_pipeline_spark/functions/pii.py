"""PII scrubbing for training-data curation: pure regexp_replace chains.

Each pattern is written in the regex subset shared by Java's engine (Spark)
and RE2 (DuckDB/Go): character classes, bounded repeats, ``\\b`` word
boundaries — no lookaround, no backreferences. That keeps the scrub
codegen'd JVM-side in Spark AND lets the DuckDB harness verify the exact
output string (``sql_scrub_pii`` emits the same chain in SQL, with RE2's
explicit ``'g'`` flag — DuckDB replaces only the first match by default).

Replacement order matters and is fixed: emails first (their local parts can
contain digit runs a later pattern could clip), then structured ids, then
IPs, then phones (the loosest pattern, anchored on a leading ``+`` so it
cannot swallow already-scrubbed digits or dates).

The scrub is a single projection — no shuffle, safe to fuse with any scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: (tag, pattern) in application order; tag X is substituted as <X>.
PII_PATTERNS: list[tuple[str, str]] = [
    ("EMAIL", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("SSN", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("IP", r"\b\d{1,3}(\.\d{1,3}){3}\b"),
    ("PHONE", r"\+\d[\d().\- ]{7,}\d"),
]


def scrub_pii(text: Column) -> Column:
    """Replace each PII occurrence with its <TAG> placeholder."""
    out = text
    for tag, pattern in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, f"<{tag}>")
    return out


def pii_counts(text: Column) -> Column:
    """Map tag → number of occurrences found in ``text`` (audit metric)."""
    return F.map_from_arrays(
        F.array(*[F.lit(tag) for tag, _ in PII_PATTERNS]),
        F.array(
            *[
                F.size(F.regexp_extract_all(text, F.lit(pattern), F.lit(0)))
                for _, pattern in PII_PATTERNS
            ]
        ),
    )


def sql_scrub_pii(expr: str) -> str:
    """The identical scrub chain as DuckDB SQL over ``expr``."""
    out = expr
    for tag, pattern in PII_PATTERNS:
        escaped = pattern.replace("'", "''")
        out = f"regexp_replace({out}, '{escaped}', '<{tag}>', 'g')"
    return out
