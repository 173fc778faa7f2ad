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
edges) leak rank mass in the plain formulation — acceptable for RANKING
use (relative order is what curation consumes, and it stays the
default); pass ``redistribute_dangling=True`` when absolute mass
matters: each round adds ONE scalar aggregate over the dangling nodes'
ranks (a broadcast-sized relation) and spreads that mass uniformly, so
total rank is conserved at 1.0 every round (property-tested in
tests/test_components.py).
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
    broadcast_nodes_limit: int = 1_000_000,
    redistribute_dangling: bool = False,
) -> DataFrame:
    """(node, rank) after ``iterations`` damped power-iteration rounds.

    Deterministic given the edge set (floating-point addition order may
    differ across engines/partitionings by ~ulp; compare ranks rounded).

    Join strategy is chosen from the MEASURED node count (known before
    the loop starts): when ``n_nodes <= broadcast_nodes_limit`` the
    (node, rank) relation broadcasts into both per-round joins, so the
    big persisted edge relation is NEVER re-shuffled — each round costs
    one shuffle (the contribution groupBy, bounded by |nodes|) instead
    of three. The default limit (~16 MB of (long, double) pairs) is safe
    for any executor; above it — web-scale graphs with 10⁹ nodes — the
    classic partitioned-join iteration runs instead.
    """
    # e is the root of THREE derivations (out-degrees, the weighted edge
    # relation, the node set) — persist it once so the upstream
    # join/distinct lineage runs once, not per branch.
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .persist()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n_nodes = nodes.count()  # materializes e's and nodes' caches
    small = n_nodes <= broadcast_nodes_limit
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    # out_deg has at most |nodes| rows — broadcast it under the same
    # bound so attaching degrees never re-shuffles the edge relation.
    ew = e.join(F.broadcast(out_deg) if small else out_deg, "src").persist()
    base = (1.0 - damping) / n_nodes
    if redistribute_dangling:
        # nodes with no out-edges: their whole rank re-enters uniformly.
        # At most |nodes| rows, derived once — the per-round cost is one
        # scalar sum over this (usually tiny) relation.
        dangling = nodes.join(
            out_deg.select(F.col("src").alias("node")), "node", "left_anti"
        ).persist()
        dangling.count()
    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes)).localCheckpoint(
        eager=True
    )
    for _ in range(iterations):
        r = F.broadcast(ranks) if small else ranks
        contrib = (
            ew.join(r, ew.src == r.node)
            .select("dst", (F.col("rank") / F.col("out_deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_sum"))
        )
        c = F.broadcast(contrib) if small else contrib
        if redistribute_dangling:
            # the dangling-mass scalar rides IN-PLAN as a broadcast 1-row
            # aggregate over the (checkpointed) previous ranks instead of
            # a per-round driver collect (round 12 fifth session, guide
            # §5.1): the round's checkpoint job now computes contrib and
            # the scalar together — one job per round, not two. The FP
            # expression replicates the collected form's operation order
            # exactly (damping·leaked → /N → base+ → +damping·in_sum),
            # so ranks are bit-identical to the driver-literal path.
            leaked_scalar = (
                ranks.join(dangling, "node", "left_semi")
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_leaked"))
            )
            ranks = (
                nodes.join(c, nodes.node == c.dst, "left")
                .crossJoin(F.broadcast(leaked_scalar))
                .select(
                    "node",
                    (
                        F.lit(base)
                        + F.lit(damping) * F.col("_leaked") / F.lit(float(n_nodes))
                        + F.lit(damping) * F.coalesce(F.col("in_sum"), F.lit(0.0))
                    ).alias("rank"),
                )
            )
        else:
            ranks = nodes.join(c, nodes.node == c.dst, "left").select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("in_sum"), F.lit(0.0))
                ).alias("rank"),
            )
        # Round-12 optimization: on the SMALL (broadcast) path the rounds
        # fuse into one lazy plan — each round references the previous
        # ranks exactly once (inside the broadcast contrib), so lineage
        # grows linearly and the per-round eager checkpoint bought only
        # an extra materialization job per round. The nested broadcast
        # exchanges still materialize once each (driver holds ≤2·rounds
        # relations bounded by broadcast_nodes_limit ≈ 16 MB each). The
        # BIG path keeps the per-round checkpoint: its ranks relation
        # re-shuffles into two joins per round, and an uncut lineage
        # would re-plan the whole history each round. Dangling
        # redistribution also keeps it — the per-round scalar collect
        # would otherwise recompute all prior rounds each time (O(R²)).
        if not small or redistribute_dangling:
            ranks = ranks.localCheckpoint(eager=True)
    if small and not redistribute_dangling:
        # one materialization for the whole fused horizon (was: one per
        # round) — it must land BEFORE the unpersists below, which would
        # otherwise pull the cached e/nodes/ew from under the lazy plan
        # and recompute the edge join once per fused round at action time
        ranks = ranks.localCheckpoint(eager=True)
    if redistribute_dangling:
        dangling.unpersist()
    ew.unpersist()
    nodes.unpersist()
    e.unpersist()
    return ranks
