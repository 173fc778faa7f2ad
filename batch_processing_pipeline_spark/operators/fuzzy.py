"""Fuzzy string matching (edit-distance joins) with a blocked scale path.

The naive formulation — ``a CROSS JOIN b WHERE levenshtein(a.s, b.s) <= 1``
— is all-pairs: O(n²) comparisons, a cartesian plan, dead at corpus scale.

The scale path uses deletion-neighborhood blocking (the SymSpell /
FastSS construction): for edit distance ≤ 1, if ``lev(a, b) <= 1`` then the
deletion neighborhoods ``D(a)`` and ``D(b)`` (the string itself plus every
single-character deletion) intersect.  Proof sketch: a substitution at
position i means deleting position i from both sides yields the same
string; an insertion in b means deleting the inserted char from b yields a;
equality is the identity variant.  So generating |s|+1 variants per string
and equi-joining on the variant finds EVERY distance-≤1 pair — the blocking
is recall-lossless, and the exact ``levenshtein`` post-filter only discards
false candidates (distance-2 pairs that happen to share a variant).

Cost: the variant relation is Σ(|s|+1) rows of (variant, id) — linear in
total text size, shuffled on fixed-width md5'd keys; candidates are an
equi-join, never a cartesian.  This is the same funnel shape as the MinHash
band join in ``operators/dedup.py`` (candidates via equi-join on derived
keys, exact verify on the survivors).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def deletion_variants(df: DataFrame, id_col: str, s_col: str) -> DataFrame:
    """(id, variant) — the string itself plus each single-char deletion.

    The explode over character positions stays inside whole-stage codegen
    (no array-lambda HOF: those run interpreted — see PLANS.md).  Variants
    are md5'd so the shuffle key is fixed-width regardless of string length.
    """
    s = F.col(s_col)
    identity = df.select(F.col(id_col), F.md5(s).alias("variant"))
    deletions = (
        df.where(F.length(s) >= 1)
        .select(
            F.col(id_col),
            s.alias("_s"),
            F.explode(F.sequence(F.lit(1), F.length(s))).alias("_i"),
        )
        .select(
            F.col(id_col),
            F.md5(
                F.concat(
                    F.col("_s").substr(F.lit(1), F.col("_i") - F.lit(1)),
                    F.col("_s").substr(
                        F.col("_i") + F.lit(1), F.length("_s") - F.col("_i")
                    ),
                )
            ).alias("variant"),
        )
    )
    return identity.unionByName(deletions)


def fuzzy_self_join(
    df: DataFrame, id_col: str, s_col: str, max_distance: int = 1
) -> DataFrame:
    """All pairs (id_a < id_b) whose strings are within ``max_distance``
    edits, found via deletion-neighborhood blocking + exact verify.

    Only ``max_distance=1`` is supported: the single-deletion neighborhood
    guarantee is exact for d ≤ 1; d ≥ 2 needs multi-deletion neighborhoods
    (|s| choose d variants), a different cost trade.
    """
    if max_distance != 1:
        raise ValueError("only max_distance=1 is supported")
    # base feeds THREE consumers (the variant relation plus both verify
    # join sides) — materialized once so the caller's upstream (typically
    # a distinct over the dictionary) is not recomputed per branch
    # (round 12, guide §3.3; same-session A/B at sf0.1: 0.47 → 0.42 s).
    # Eager checkpoint: construction runs a job (rank-family precedent);
    # the pin is dictionary-sized.
    base = (
        df.select(F.col(id_col), F.col(s_col))
        .where(F.col(s_col).isNotNull())
        .localCheckpoint(eager=True)
    )
    v = deletion_variants(base, id_col, s_col)
    a = v.alias("a")
    b = v.alias("b")
    cand = (
        a.join(
            b,
            on=[
                F.col("a.variant") == F.col("b.variant"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )
    left = base.withColumnRenamed(id_col, "id_a").withColumnRenamed(s_col, "s_a")
    right = base.withColumnRenamed(id_col, "id_b").withColumnRenamed(s_col, "s_b")
    return (
        cand.join(left, "id_a")
        .join(right, "id_b")
        .where(F.levenshtein(F.col("s_a"), F.col("s_b")) <= max_distance)
        .select(
            "id_a",
            "id_b",
            "s_a",
            "s_b",
            F.levenshtein(F.col("s_a"), F.col("s_b")).cast("long").alias("distance"),
        )
    )
