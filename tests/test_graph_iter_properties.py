"""Property-based tests (hypothesis): graph_iter operators vs exact
pure-python references on random small graphs — synchronous LPA and
capped BFS are simple enough to replay exactly, so the differential is
full dict equality, not just invariants."""

from __future__ import annotations

from collections import Counter, deque

from hypothesis import given, settings
from hypothesis import strategies as st

from batch_processing_pipeline_spark.operators.graph_iter import (
    bfs_distances,
    label_propagation,
)

_PAIRS = [(a, b) for a in range(1, 8) for b in range(a + 1, 8)]
_EDGE_LISTS = st.lists(st.sampled_from(_PAIRS), unique=True, min_size=1, max_size=10)


def _adj(edges):
    nbr: dict[int, set[int]] = {}
    for u, v in edges:
        nbr.setdefault(u, set()).add(v)
        nbr.setdefault(v, set()).add(u)
    return nbr


def _ref_lpa(edges, rounds):
    nbr = _adj(edges)
    labels = {n: n for n in nbr}
    for _ in range(rounds):
        labels = {
            n: min(
                lab
                for lab, c in Counter(labels[m] for m in nbr[n]).items()
                if c == max(Counter(labels[m] for m in nbr[n]).values())
            )
            for n in nbr
        }
    return labels


def _ref_bfs(edges, max_hops):
    nbr = _adj(edges)
    src = min(nbr)
    dist = {src: 0}
    q = deque([src])
    while q:
        n = q.popleft()
        if dist[n] == max_hops:
            continue
        for m in nbr[n]:
            if m not in dist:
                dist[m] = dist[n] + 1
                q.append(m)
    return dist


@settings(max_examples=6, deadline=None)
@given(edges=_EDGE_LISTS, rounds=st.integers(min_value=1, max_value=3))
def test_lpa_matches_exact_reference(spark, edges, rounds):
    df = spark.createDataFrame(edges, "u long, v long")
    got = {r.n: r.label for r in label_propagation(df, rounds=rounds).collect()}
    assert got == _ref_lpa(edges, rounds)


@settings(max_examples=6, deadline=None)
@given(edges=_EDGE_LISTS, max_hops=st.integers(min_value=1, max_value=3))
def test_bfs_matches_exact_reference(spark, edges, max_hops):
    df = spark.createDataFrame(edges, "u long, v long")
    got = {r.n: r.d for r in bfs_distances(df, max_hops=max_hops).collect()}
    assert got == _ref_bfs(edges, max_hops)
