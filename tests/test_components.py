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
