"""PageRank over an edge relation — graph centrality as a curation signal.

Web-corpus pipelines score domains/pages by link centrality (PageRank,
harmonic centrality) as a quality prior; the same iteration serves any
entity graph (customer↔supplier transaction graphs, citation graphs,
near-dup similarity graphs). Standard damped power iteration:

    rank(v) ← (1-d)/N + d · Σ_{u→v} rank(u) / out_degree(u)

Driver-controlled loop (the Spark shape for iterative algorithms, same
skeleton as operators/components.py): each round is one equi-join of the
edge relation with the current rank relation, a partial-aggregating
groupBy on the destination, and a ``localCheckpoint`` to truncate the
lineage — without it the plan doubles per round and the driver OOMs
during analysis long before the data is a problem.

Scale notes: only (node, rank) pairs and the static (src, dst, out_deg)
edge relation shuffle; edges are re-used every round, so the caller-
visible contract persists them once up front. Dangling nodes (no out-
edges) leak rank mass in this formulation — acceptable for RANKING use
(relative order is what curation consumes); redistribute if absolute
mass matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """(node, rank) after ``iterations`` damped power-iteration rounds.

    Deterministic given the edge set (floating-point addition order may
    differ across engines/partitionings by ~ulp; compare ranks rounded).
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    ew = e.join(out_deg, "src").persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n_nodes = nodes.count()  # also materializes both persists' lineage roots
    base = (1.0 - damping) / n_nodes
    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes)).localCheckpoint(
        eager=True
    )
    for _ in range(iterations):
        contrib = (
            ew.join(ranks, ew.src == ranks.node)
            .select("dst", (F.col("rank") / F.col("out_deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("in_sum"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    ew.unpersist()
    nodes.unpersist()
    return ranks
