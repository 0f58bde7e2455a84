"""Semi-clustering: structural assertions on the reference test graph
(SemiClusteringTest.java:35-72: 5 output rows) + score invariants."""

from __future__ import annotations

import pytest

from okapi_spark.graph.graph import Graph
from okapi_spark.operators.semiclustering import semi_clustering
from tests.conftest import FIVE_VERTEX, toy_edges


def test_semiclustering_reference_shape(spark):
    g = Graph.from_edges(toy_edges(spark, FIVE_VERTEX))
    out = semi_clustering(g, iterations=10, max_clusters=2, cluster_capacity=2)
    rows = out.collect()
    assert len(rows) == 5  # SemiClusteringTest.java:71
    by_id = {r.id: r.clusters for r in rows}
    for vid, clusters in by_id.items():
        assert 1 <= len(clusters) <= 2
        for c in clusters:
            assert vid in c.vs              # value clusters contain the vertex
            assert len(c.vs) <= 2           # capacity respected
            assert c.vs == sorted(c.vs)


def test_semiclustering_pair_scores(spark):
    """With capacity 2, a cluster {u,v} has I = w(u,v) and
    B = deg_w(u)+deg_w(v)−2w(u,v); score = I − 0.5·B (denominator 1)."""
    g = Graph.from_edges(toy_edges(spark, FIVE_VERTEX))
    out = semi_clustering(g, iterations=6, max_clusters=2, cluster_capacity=2)
    deg = {1: 2.0, 2: 3.0, 3: 6.0, 4: 3.0, 5: 2.0}
    w = {}
    for s, d, ww in FIVE_VERTEX:
        w[(s, d)] = ww
        w[(d, s)] = ww
    for r in out.collect():
        for c in r.clusters:
            if len(c.vs) == 2:
                u, v = c.vs
                # clusters spread multi-hop (outbox = unioned set), so
                # non-adjacent pairs are legitimate with inner = 0
                inner = w.get((u, v), 0.0)
                boundary = deg[u] + deg[v] - 2 * inner
                assert c.inner == pytest.approx(inner)
                assert c.boundary == pytest.approx(boundary)
                assert c.score == pytest.approx(inner - 0.5 * boundary)
