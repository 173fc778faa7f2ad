"""graph_iter operators on a hand-computed graph: two triangles
{1,2,3} and {4,5,6} joined by the bridge 3-4 (plus an isolated edge
7-8 for reachability) — small enough that every LPA round and BFS
level is verifiable by hand."""

from __future__ import annotations

from batch_processing_pipeline_spark.operators.graph_iter import (
    bfs_distances,
    label_propagation,
)

EDGES = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]


def _edges(spark, extra=()):
    return spark.createDataFrame(list(EDGES) + list(extra), "u long, v long")


def test_label_propagation_splits_bridged_triangles(spark):
    got = {r.n: r.label for r in label_propagation(_edges(spark), rounds=5).collect()}
    # hand-rolled sync-LPA with smallest-label ties stabilizes at
    # round 3: the triangles keep their own communities despite the
    # bridge (labels 1 and 3 — 3 wins B's argmax via the bridge path)
    assert got == {1: 1, 2: 1, 3: 1, 4: 3, 5: 3, 6: 3}


def test_label_propagation_isolated_pair_oscillates_deterministically(spark):
    # an isolated 2-node component is synchronous LPA's textbook
    # oscillator: each round the pair SWAPS labels, which is exactly why
    # the operator runs a fixed horizon instead of "to convergence" —
    # after an odd number of rounds the labels are deterministically
    # swapped, and labels never leak across components
    got = {
        r.n: r.label
        for r in label_propagation(_edges(spark, [(7, 8)]), rounds=5).collect()
    }
    assert got[7] == 8 and got[8] == 7
    assert {got[n] for n in (1, 2, 3)} == {1} and {got[n] for n in (4, 5, 6)} == {3}


def test_bfs_default_source_is_min_node(spark):
    got = {r.n: r.d for r in bfs_distances(_edges(spark), max_hops=4).collect()}
    assert got == {1: 0, 2: 1, 3: 1, 4: 2, 5: 3, 6: 3}


def test_bfs_explicit_source_and_unreached_nodes(spark):
    src = spark.createDataFrame([(5,)], "n long")
    got = {
        r.n: r.d
        for r in bfs_distances(
            _edges(spark, [(7, 8)]), sources=src, max_hops=4
        ).collect()
    }
    # 7/8 are in another component: absent, not infinite
    assert got == {5: 0, 4: 1, 6: 1, 3: 2, 1: 3, 2: 3}


def test_bfs_horizon_truncates(spark):
    got = {r.n: r.d for r in bfs_distances(_edges(spark), max_hops=2).collect()}
    assert got == {1: 0, 2: 1, 3: 1, 4: 2}  # 5 and 6 are beyond the horizon
