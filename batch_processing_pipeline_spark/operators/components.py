"""Connected components — transitive closure of near-duplicate pairs.

Pairwise dedup (MinHash/SimHash/embedding) emits edges; the curation step
needs CLUSTERS: if A≈B and B≈C, then {A,B,C} keep one survivor. This is
connected components, computed by iterative min-label propagation:

    label(v) ← min(label(v), min over neighbors u of label(u))

repeated until fixpoint, PLUS pointer doubling each round — after the
neighbor step, every label is replaced by its label's label (twice):

    label(v) ← min(label(v), label(label(v)))

Label values are node ids, so the label table doubles as a parent-pointer
forest and the shortcut is a self-join. Neighbor propagation alone needs
O(diameter) rounds (fine for near-dup cliques, pathological for
chain-shaped duplicate graphs A≈B≈C≈…); doubling contracts paths
geometrically, giving O(log n) rounds on any topology — the
Shiloach–Vishkin shortcut, same round bound as the large-star/small-star
formulation (Kiveris et al., 2014). A 1000-node path converges in ≤ 12
rounds (asserted in tests/test_components.py).

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
    # localCheckpoint (not persist): each round's label table references
    # the previous one several times (neighbor join, two pointer hops,
    # convergence diff), so an un-truncated lineage grows exponentially in
    # the round count and OOMs the driver during analysis. Checkpointing
    # materializes the round AND cuts the plan back to a leaf.
    labels = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.v == labels.node)
            .groupBy("u")
            .agg(F.min("component").alias("nbr_component"))
        )
        # `__old` (this round's starting component) rides through the
        # round so convergence is a COLUMN of the checkpointed result,
        # not a separate join: the historical per-round old-vs-new join
        # re-shuffled two full label tables per round purely to count
        # changes (round-12 optimization — measured ~30% of each round).
        stepped = labels.join(
            neighbor_min, labels.node == neighbor_min.u, "left"
        ).select(
            "node",
            F.col("component").alias("__old"),
            F.least(
                F.col("component"), F.coalesce(F.col("nbr_component"), F.col("component"))
            ).alias("component"),
        )
        # pointer doubling ×2: component values are node ids, so joining
        # the label table to itself dereferences one pointer hop; two hops
        # per round contract chain graphs geometrically (O(log n) rounds
        # total instead of O(diameter)).
        for _hop in range(2):
            parent = stepped.select(
                F.col("node").alias("_pn"), F.col("component").alias("_pc")
            )
            stepped = stepped.join(
                parent, stepped.component == F.col("_pn"), "left"
            ).select(
                "node",
                "__old",
                F.least(
                    F.col("component"), F.coalesce(F.col("_pc"), F.col("component"))
                ).alias("component"),
            )
        new_labels = stepped.withColumn(
            "__chg", F.col("component") != F.col("__old")
        ).drop("__old").localCheckpoint(eager=True)
        # fixpoint ⇔ no row changed; take(1) over the checkpointed
        # partitions short-circuits — no shuffle, no second pass
        converged = new_labels.where(F.col("__chg")).isEmpty()
        labels = new_labels.drop("__chg")
        if converged:
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
