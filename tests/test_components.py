"""Connected components: golden graphs + cluster survivor extraction."""

from __future__ import annotations

from batch_processing_pipeline_spark.operators.components import (
    connected_components,
    dedup_clusters,
)

SCHEMA = "id_a long, id_b long"


def test_chain_collapses_to_one_component(spark):
    # 1-2-3-4-5 chain: diameter 4, must converge to min label 1
    pairs = spark.createDataFrame([(1, 2), (2, 3), (3, 4), (4, 5)], SCHEMA)
    got = {r.node: r.component for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_separate_cliques_stay_separate(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (10, 11), (20, 21), (21, 22)], SCHEMA
    )
    got = {r.node: r.component for r in connected_components(pairs).collect()}
    assert got[1] == got[2] == got[3] == 1
    assert got[10] == got[11] == 10
    assert got[20] == got[21] == got[22] == 20


def test_dedup_clusters_sizes_and_survivors(spark):
    pairs = spark.createDataFrame([(5, 9), (9, 7), (30, 31)], SCHEMA)
    got = {r.component: (r.size, r.survivor) for r in dedup_clusters(pairs).collect()}
    assert got[5] == (3, 5)
    assert got[30] == (2, 30)


def test_chain_graph_converges_in_log_rounds(spark):
    """A 1000-node path A-B-C-… is the worst case for plain min-label
    propagation (O(diameter) rounds); pointer doubling must converge it
    within 12 driver rounds."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(999)], "id_a long, id_b long"
    )
    labels = connected_components(edges, max_iterations=12)
    comps = {r.component for r in labels.collect()}
    assert comps == {0}
    assert labels.count() == 1000


def test_pagerank_star_graph_ranks_hub_highest(spark):
    """On a star (all leaves point at the hub, hub points back), the hub
    must out-rank every leaf, leaves tie, and total mass stays bounded."""
    from batch_processing_pipeline_spark.operators.pagerank import pagerank

    leaves = list(range(1, 6))
    edges = [(leaf, 0) for leaf in leaves] + [(0, leaf) for leaf in leaves]
    df = spark.createDataFrame(edges, "src long, dst long")
    ranks = {r.node: r.rank for r in pagerank(df, iterations=10).collect()}
    hub = ranks[0]
    assert all(hub > ranks[leaf] for leaf in leaves)
    leaf_vals = {round(ranks[leaf], 12) for leaf in leaves}
    assert len(leaf_vals) == 1  # symmetric leaves tie exactly
    assert 0.99 < sum(ranks.values()) <= 1.000001  # no dangling nodes -> mass conserved


def test_pagerank_dangling_mass_conservation(spark):
    """A graph WITH dangling nodes (sinks, no out-edges) leaks rank mass in
    the plain formulation; ``redistribute_dangling=True`` must conserve
    total mass at exactly 1.0 (one scalar aggregate per round), and must
    match a numpy reference power iteration node-for-node."""
    import numpy as np

    from batch_processing_pipeline_spark.operators.pagerank import pagerank

    # 0->1, 0->2, 1->2, 3->0 ; node 2 is dangling (a pure sink)
    edges = [(0, 1), (0, 2), (1, 2), (3, 0)]
    df = spark.createDataFrame(edges, "src long, dst long")

    plain = {r.node: r.rank for r in pagerank(df, iterations=10).collect()}
    assert sum(plain.values()) < 0.99  # the leak this feature exists to fix

    fixed = {
        r.node: r.rank
        for r in pagerank(df, iterations=10, redistribute_dangling=True).collect()
    }
    assert abs(sum(fixed.values()) - 1.0) < 1e-9

    # numpy reference: damped power iteration with uniform dangling spread
    d, n = 0.85, 4
    out = {0: [1, 2], 1: [2], 3: [0]}
    r = np.full(n, 1.0 / n)
    for _ in range(10):
        nxt = np.full(n, (1.0 - d) / n)
        nxt += d * r[2] / n  # node 2 dangling
        for u, vs in out.items():
            for v in vs:
                nxt[v] += d * r[u] / len(vs)
        r = nxt
    for node in range(n):
        assert abs(fixed[node] - r[node]) < 1e-9, node

    # ranking mode (the default) is unchanged: relative order agrees
    order_plain = sorted(plain, key=plain.get)
    order_fixed = sorted(fixed, key=fixed.get)
    assert order_plain == order_fixed
