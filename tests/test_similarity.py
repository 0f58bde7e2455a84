"""Jaccard / Adamic-Adar / clustering coefficient vs reference goldens
(JaccardTest.java:78-94 values; FIXTURES.md §3.3) and python oracles."""

from __future__ import annotations

import math

import pytest

from okapi_spark.graph.graph import Graph
from okapi_spark.operators.similarity import (
    adamic_adar,
    clustering_coefficient,
    global_clustering_coefficient,
    jaccard,
)
from tests.conftest import FIVE_VERTEX, toy_edges

# JaccardTest.java:34-53 graph (undirected pairs)
JACCARD_GRAPH = [
    (1, 2, 0.0), (1, 3, 0.0), (1, 4, 0.0), (2, 4, 0.0),
    (2, 5, 0.0), (3, 4, 0.0), (4, 5, 0.0), (5, 6, 0.0),
]

# goldens from JaccardTest.java:78-94
JACCARD_GOLD = {
    (1, 2): 0.2, (1, 3): 0.25, (1, 4): 0.4, (2, 4): 0.4,
    (2, 5): 0.2, (3, 4): 0.2, (4, 5): 0.1666, (5, 6): 0.0,
}


def test_jaccard_reference_goldens(spark):
    g = Graph.from_edges(toy_edges(spark, JACCARD_GRAPH))
    got = {(r.u, r.v): r.sim for r in jaccard(g).collect()}
    assert set(got) == set(JACCARD_GOLD)
    for k, v in JACCARD_GOLD.items():
        assert got[k] == pytest.approx(v, abs=1e-4), k


def test_jaccard_distance_transform(spark):
    g = Graph.from_edges(toy_edges(spark, JACCARD_GRAPH))
    got = {(r.u, r.v): r.sim for r in jaccard(g, distance=True).collect()}
    assert got[(1, 2)] == pytest.approx(1 / 0.2 - 1, abs=1e-4)
    assert got[(5, 6)] is None  # ∞ in the reference (sim 0)


def _adj_sets(edges):
    adj = {}
    for s, d, _ in edges:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    return adj


def test_adamic_adar_oracle(spark):
    g = Graph.from_edges(toy_edges(spark, JACCARD_GRAPH))
    adj = _adj_sets(JACCARD_GRAPH)
    got = {(r.u, r.v): r.aa for r in adamic_adar(g).collect()}
    for (u, v), aa in got.items():
        want = sum(math.log(1 / len(adj[c])) for c in adj[u] & adj[v])
        assert aa == pytest.approx(want, abs=1e-9), (u, v)


def test_clustering_coefficient(spark):
    """FIVE_VERTEX: triangles {1,2,3},{3,4,5}; degrees 2,2,4,2,2."""
    g = Graph.from_edges(toy_edges(spark, FIVE_VERTEX))
    got = {r.id: r.coeff for r in clustering_coefficient(g).collect()}
    assert got[1] == pytest.approx(1.0)
    assert got[2] == pytest.approx(1.0)
    assert got[3] == pytest.approx(2 * 2 / (4 * 3))
    assert got[4] == pytest.approx(1.0)
    assert got[5] == pytest.approx(1.0)
    # ClusteringCoefficientTest.java:68: output has 5 rows
    assert len(got) == 5
    want_avg = sum(got.values()) / 5
    assert global_clustering_coefficient(g) == pytest.approx(want_avg)
