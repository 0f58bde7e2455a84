"""Graph-mutation operators: k-core, semimetric removal, b-matching."""

from __future__ import annotations

import pytest

from okapi_spark.graph.graph import Graph
from okapi_spark.operators.bmatching import max_b_matching
from okapi_spark.operators.kcore import kcore
from okapi_spark.operators.semimetric import remove_semimetric, semimetric_edges
from tests.conftest import SIX_VERTEX_SEMIMETRIC, toy_edges
from tests.oracles import kcore_oracle


def test_kcore(spark):
    # clique {1..5} (4-core) + pendant chain
    edges = [(a, b, 1.0) for a in range(1, 6) for b in range(a + 1, 6)]
    edges += [(5, 10, 1.0), (10, 11, 1.0)]
    g = Graph.from_edges(toy_edges(spark, edges))
    for k in (2, 3, 4, 5):
        sub = kcore(g, k)
        got = sorted(r.id for r in sub.vertices().collect())
        want = sorted(kcore_oracle([(s, d) for s, d, _ in edges], k))
        assert got == want, f"k={k}"


def test_semimetric_reference_golden(spark):
    """SemimetricTrianglesTest.java:34-87: edges (1,2) and (3,6) are
    semi-metric; vertex 1 keeps only neighbor 4; vertex 3 keeps {2,5}."""
    g = Graph.from_edges(toy_edges(spark, SIX_VERTEX_SEMIMETRIC))
    bad = sorted((r.u, r.v) for r in semimetric_edges(g).collect())
    assert bad == [(1, 2), (3, 6)]
    cleaned = remove_semimetric(g)
    nbrs1 = sorted(r.dst for r in cleaned.edges.filter("src = 1").collect())
    assert nbrs1 == [4]
    nbrs3 = sorted(r.dst for r in cleaned.edges.filter("src = 3").collect())
    assert nbrs3 == [2, 5]


def test_max_b_matching_reference_golden(spark):
    """MaxBMatchingTest.java:24-60: capacities 1:1 2:2 3:1 4:1 5:3;
    result drops (1,3) and (2,4), keeps the other four edges."""
    edges = [(1, 2, 3.0), (1, 3, 1.0), (2, 4, 1.0), (2, 5, 1.0),
             (3, 5, 3.0), (4, 5, 2.0)]
    caps = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 1), (4, 1), (5, 3)], "id long, capacity int"
    )
    g = Graph.from_edges(toy_edges(spark, edges))
    got = sorted((r.u, r.v, r.weight) for r in max_b_matching(g, caps).collect())
    assert got == [(1, 2, 3.0), (2, 5, 1.0), (3, 5, 3.0), (4, 5, 2.0)]
