"""Triangle counting vs adjacency-set oracle — exact (north rule)."""

from __future__ import annotations

import numpy as np
import pytest

from okapi_spark.graph.graph import Graph
from okapi_spark.operators.triangles import (
    triangle_count,
    triangle_count_per_vertex,
    triangles_df,
)
from tests.conftest import FIVE_VERTEX, toy_edges
from tests.oracles import triangle_oracle


def test_triangles_toy(spark):
    """FIXTURES.md §3.1: triangles {1,2,3} and {3,4,5} → count 2."""
    g = Graph.from_edges(toy_edges(spark, FIVE_VERTEX))
    assert triangle_count(g) == 2
    tri = sorted(tuple(r) for r in triangles_df(g).collect())
    assert tri == [(1, 2, 3), (3, 4, 5)]
    per_v = {r.id: r.triangles for r in triangle_count_per_vertex(g).collect()}
    assert per_v == {3: 1, 5: 1}  # placed at max-id vertex (Triangles.java:131-151)


@pytest.mark.parametrize("chunks", [1, 4])
def test_triangles_random(spark, chunks):
    rng = np.random.default_rng(5)
    n = 60
    edges = []
    for i in range(1, n + 1):
        for j in range(i + 1, n + 1):
            if rng.random() < 0.15:
                edges.append((i, j, 1.0))
    g = Graph.from_edges(toy_edges(spark, edges))
    want_total, want_per_max = triangle_oracle([(s, d) for s, d, _ in edges])
    assert triangle_count(g, chunks=chunks) == want_total
    got = {r.id: r.triangles for r in triangle_count_per_vertex(g, chunks=chunks).collect()}
    assert got == want_per_max


def test_triangles_directed_input_counts_undirected(spark):
    """A one-directional edge listing still yields the undirected count."""
    edges = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 1.0), (1, 3, 1.0)], "src long, dst long, weight double"
    )
    g = Graph.from_edges(edges)
    assert triangle_count(g) == 1
