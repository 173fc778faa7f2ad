"""Exact set-similarity join with prefix filtering (AllPairs / PPJoin
family, Bayardo et al., WWW 2007; Xiao et al., WWW 2008).

The fourth near-duplicate modality in the engine, and the only *exact*
scale path: MinHash/SimHash (operators/dedup.py) trade recall for speed,
while prefix filtering prunes candidates WITHOUT losing a single
qualifying pair.  The guarantee: order every token by ascending global
document frequency (rarest first); for a set of size n and Jaccard
threshold t, any other set with J >= t must share at least one of the
first ``n - ceil(t*n) + 1`` tokens (the *prefix*) — two sets whose
prefixes are disjoint cannot reach the threshold, because each would need
to cover the other's skipped mass.  So candidate generation is an
equi-join on prefix tokens only, and the rarest-first order makes those
join keys the LEAST skewed tokens in the corpus.

100-TB shape: token df ranking is one groupBy; the candidate join's
fan-out is bounded by prefix length x token rarity (stopwords never enter
a prefix at sensible thresholds); verification touches candidate pairs
only, via array_intersect on the two token arrays (JVM codegen, no UDF).
Versus all-pairs: O(candidates) instead of O(n^2) with identical output —
asserted against the brute-force join in tests and hash-matched against a
DuckDB all-pairs oracle.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def token_sets(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, tokens) with tokens = DISTINCT whitespace words of lower(trim(text))."""
    return (
        docs.where(F.length(F.lower(F.trim(F.col(text_col)))) > 0)
        .select(
            F.col(id_col).alias("id"),
            F.array_distinct(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
            ).alias("tokens"),
        )
        .where(F.size("tokens") > 0)
    )


#: ceil(t*n) must not overshoot when t*n is an exact integer that IEEE
#: multiplication lands a hair ABOVE (0.55*100 == 55.000000000000007 →
#: ceil 56 → prefix one too short → qualifying pairs silently lost).
#: Subtracting this epsilon before ceil is lossless: it can only ever
#: LENGTHEN a prefix (when t*n sits within 1e-9 above an integer), never
#: shorten one.
_CEIL_EPS = 1e-9


def prefix_candidates(sets: DataFrame, threshold: float) -> DataFrame:
    """Candidate pairs (id_a < id_b) sharing >=1 prefix token.

    ``sets`` is the (id, tokens) relation from :func:`token_sets`.  Shared
    by :func:`ppjoin_pairs` and the pruning test, so the production prefix
    formula is the one under test.
    """
    # global rarest-first token order: ascending document frequency,
    # token string as the deterministic tie-break.  The ORDER is all the
    # prefix theorem needs — any total order works — so we sort each
    # document's tokens by the (df, token) TUPLE directly instead of
    # materializing dense global ranks (a row_number over the whole vocab
    # would be a single-partition sort: the one non-scalable step).
    tok = sets.select("id", F.explode("tokens").alias("token"))
    df_rank = tok.groupBy("token").agg(F.count("*").alias("df"))

    # per-set prefix: first (n - ceil(t*n) + 1) tokens in rarity order
    ranked = (
        tok.join(df_rank, "token")
        .withColumn(
            "pos",
            F.row_number().over(
                Window.partitionBy("id").orderBy("df", "token")
            ),
        )
        .withColumn("n", F.count("*").over(Window.partitionBy("id")))
    )
    prefix = ranked.where(
        F.col("pos")
        <= F.col("n")
        - F.ceil(F.lit(threshold) * F.col("n") - F.lit(_CEIL_EPS))
        + 1
    ).select("id", "token")

    # candidates: pairs sharing any prefix token (rarest-first order keeps
    # this join's key distribution the least skewed possible)
    a, b = prefix.alias("a"), prefix.alias("b")
    return (
        a.join(b, (F.col("a.token") == F.col("b.token")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def ppjoin_pairs(docs: DataFrame, threshold: float = 0.6) -> DataFrame:
    """All pairs with word-set Jaccard >= ``threshold`` — exact result,
    prefix-filtered candidates.

    Returns (id_a, id_b, jac) with id_a < id_b and ``jac`` unrounded
    (callers round for oracle comparison).
    """
    sets = token_sets(docs)
    cand = prefix_candidates(sets, threshold)

    # exact verification on candidates only
    sa = sets.select(F.col("id").alias("id_a"), F.col("tokens").alias("ta"))
    sb = sets.select(F.col("id").alias("id_b"), F.col("tokens").alias("tb"))
    inter = F.size(F.array_intersect("ta", "tb"))
    union = F.size("ta") + F.size("tb") - inter
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a", "id_b", (inter.cast("double") / union).alias("jac")
        )
        .where(F.col("jac") >= threshold)
    )


def allpairs_jaccard_bruteforce(docs: DataFrame, threshold: float = 0.6) -> DataFrame:
    """O(n^2) ground truth for tests: full cross self-join, same output."""
    sets = token_sets(docs)
    sa = sets.select(F.col("id").alias("id_a"), F.col("tokens").alias("ta"))
    sb = sets.select(F.col("id").alias("id_b"), F.col("tokens").alias("tb"))
    inter = F.size(F.array_intersect("ta", "tb"))
    union = F.size("ta") + F.size("tb") - inter
    return (
        sa.join(sb, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", (inter.cast("double") / union).alias("jac"))
        .where(F.col("jac") >= threshold)
    )


def prefix_length(n: int, threshold: float) -> int:
    """Prefix size for a set of ``n`` tokens at Jaccard ``threshold``."""
    return n - math.ceil(threshold * n - _CEIL_EPS) + 1
