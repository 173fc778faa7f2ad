"""Connected components — transitive closure of near-duplicate pairs.

Pairwise dedup (MinHash/SimHash/embedding) emits edges; the curation step
needs CLUSTERS: if A≈B and B≈C, then {A,B,C} keep one survivor. This is
connected components, computed by iterative min-label propagation:

    label(v) ← min(label(v), min over neighbors u of label(u))

repeated until fixpoint. Converges in O(diameter) rounds for this
formulation (each round is two shuffles: edge join + min aggregate);
near-dup graphs are unions of small cliques, so 2–3 rounds in practice.
Labels are persisted per round and the loop is driver-controlled with an
explicit convergence check — the standard Spark shape for iterative
algorithms (GraphFrames' CC uses the same skeleton).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """(node, component) for every node in ``pairs``; component = min id
    reachable. Isolated nodes never appear in pairs, so callers union them
    back with label = own id if needed."""
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .persist()
    )
    labels.count()
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.v == labels.node)
            .groupBy("u")
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.u, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_component"), F.col("component"))
                ).alias("component"),
            )
            .persist()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    return labels


def dedup_clusters(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """(component, size, survivor) per duplicate cluster; survivor = min id."""
    cc = connected_components(pairs, src, dst)
    return cc.groupBy("component").agg(
        F.count(F.lit(1)).alias("size"), F.min("node").alias("survivor")
    )
