"""Fixed-horizon iterative graph operators: label propagation and BFS.

Community detection (synchronous LPA, Raghavan et al. 2007) and
single-source hop distance complete the graph family next to
connectivity (operators/components.py), centrality
(operators/pagerank.py), and the counting/density queries. Both use
the driver-controlled loop skeleton shared by pagerank/components:
each round is one equi-join with the static symmetrized edge relation,
one partial-aggregating groupBy, and a ``localCheckpoint`` to truncate
lineage (without it the plan doubles per round).

Both run a FIXED number of synchronized rounds rather than "to
convergence": synchronous LPA can oscillate between two labelings, so
a convergence predicate is not well-defined, and a fixed horizon makes
the result deterministic and oracle-replayable (the registry queries'
DuckDB twins unroll the same rounds as materialized CTEs). This is
the graphframes semantics as well.

Scale notes: only (node, label) / (node, dist) pairs shuffle per
round — never adjacency lists — and BFS expands the FRONTIER only
(see ``bfs_distances``), so its per-round join input is bounded by
last round's discoveries, not the whole reached set. Callers pass
the one-direction (u < v) edge relation; symmetrization is internal
and the relation should be persisted by the caller for the duration
of the loop (both registry users do, via ``_copurchase_graph``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def _symmetrize(edges: DataFrame, u_col: str, v_col: str) -> DataFrame:
    une = edges.select(F.col(u_col).alias("u"), F.col(v_col).alias("v"))
    return une.unionByName(
        une.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )


def label_propagation(
    edges: DataFrame,
    u_col: str = "u",
    v_col: str = "v",
    rounds: int = 5,
) -> DataFrame:
    """Synchronous LPA over an undirected edge relation.

    Every node starts as its own label; each round ALL nodes
    simultaneously adopt their neighbors' most frequent label, ties to
    the SMALLEST label (the deterministic argmax: one groupBy count +
    one row_number window per round). Returns ``(n, label)``.
    """
    bidir = _symmetrize(edges, u_col, v_col)
    labels = (
        bidir.select(F.col("u").alias("n"))
        .distinct()
        .select("n", F.col("n").alias("label"))
    )
    w = Window.partitionBy("n").orderBy(F.col("c").desc(), F.col("label").asc())
    for i in range(rounds):
        neigh = bidir.join(
            labels.withColumnRenamed("n", "v"), "v"
        ).select(F.col("u").alias("n"), "label")
        counted = neigh.groupBy("n", "label").agg(F.count(F.lit(1)).alias("c"))
        labels = (
            counted.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") == 1)
            .select("n", "label")
        )
        # Round-12 optimization: rounds are FUSED into one lazy plan —
        # each round references the previous labels exactly ONCE (the
        # neighbor join), so lineage grows linearly, not exponentially,
        # and no per-round materialization is needed; the whole horizon
        # runs as one job (one pipeline of 2 shuffles/round) instead of
        # `rounds` jobs each paying checkpoint storage + scheduling.
        # All values are integers and the argmax is fully tie-broken, so
        # fusion cannot move a result. A checkpoint every 8 rounds keeps
        # plan size bounded for long horizons (the registry users run 5).
        if (i + 1) % 8 == 0 and (i + 1) < rounds:
            labels = labels.localCheckpoint(eager=True)
    # ONE materialization for the whole fused horizon (was: one per
    # round). It must happen HERE, not at the caller's first action:
    # both registry users unpersist the edge cache as soon as this
    # function returns, and a still-lazy plan would then recompute the
    # co-purchase join once per fused round at action time.
    return labels.localCheckpoint(eager=True)


def bfs_distances(
    edges: DataFrame,
    sources: DataFrame | None = None,
    u_col: str = "u",
    v_col: str = "v",
    max_hops: int = 4,
) -> DataFrame:
    """Hop distances within ``max_hops`` of the source set.

    ``sources`` is a one-column relation of start nodes (distance 0);
    when omitted, the single smallest node id in the graph starts the
    search. FRONTIER expansion: a BFS distance is final the round it
    is first discovered, so each round joins the edge relation with
    only LAST round's newly-discovered nodes and anti-joins the result
    against everything already reached — per-round shuffle input is
    frontier-sized + reached node IDS, never reached × degree the way
    a full min-merge re-aggregation would be. An exhausted frontier
    makes the remaining rounds empty-relation no-ops, so no per-round
    driver action (count) is needed to stop early. Returns ``(n, d)``
    for reached nodes only.
    """
    bidir = _symmetrize(edges, u_col, v_col)
    if sources is None:
        sources = bidir.groupBy().agg(F.min("u").alias("n"))
    else:
        sources = sources.select(F.col(sources.columns[0]).alias("n")).distinct()
    dist = sources.select(
        "n", F.lit(0).cast("long").alias("d")
    ).localCheckpoint(eager=True)
    frontier = dist.select("n")
    for i in range(max_hops):
        new = (
            bidir.join(frontier.select(F.col("n").alias("v")), "v")
            .select(F.col("u").alias("n"))
            .distinct()
            .join(dist.select("n"), "n", "left_anti")
            .select("n", F.lit(i + 1).cast("long").alias("d"))
            .localCheckpoint(eager=True)
        )
        # Round-12 optimization: `dist` stays a LAZY union of the
        # checkpointed per-round discoveries — its lineage is a shallow
        # union of R leaves, so re-checkpointing the whole reached set
        # every round (O(reached) storage writes per round, O(R·reached)
        # total) bought nothing. Only `new` needs pinning: it feeds three
        # consumers (the union, next round's frontier, next round's
        # anti-join) and is frontier-sized.
        dist = dist.unionByName(new)
        frontier = new.select("n")
    return dist
