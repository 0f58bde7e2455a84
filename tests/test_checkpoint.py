"""Checkpoint/resume: kill at superstep k → resume → identical fixpoint
(north rule resumability; SURVEY.md §5 invariant tests)."""

from __future__ import annotations

import pytest

from okapi_spark.bsp import CheckpointStore
from okapi_spark.graph.graph import Graph
from okapi_spark.operators.components import connected_components
from okapi_spark.operators.pagerank import pagerank
from tests.conftest import FIVE_VERTEX, toy_edges


def test_pagerank_kill_and_resume(spark, tmp_path):
    g = Graph.from_edges(toy_edges(spark, FIVE_VERTEX))
    # uninterrupted run = golden
    golden = pagerank(g, tol=1e-8)
    want = {r.id: r.rank for r in golden.state.collect()}

    store = CheckpointStore(str(tmp_path / "ckpt"))
    # "crash" after 3 supersteps (max_supersteps caps the loop mid-flight)
    partial = pagerank(g, tol=1e-8, store=store, max_supersteps=3)
    assert not partial.converged
    assert store.latest()["superstep"] == 2

    # resume from the same store → runs remaining supersteps only
    resumed = pagerank(g, tol=1e-8, store=store, max_supersteps=100)
    assert resumed.converged
    got = {r.id: r.rank for r in resumed.state.collect()}
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    # lineage ledger is continuous: supersteps 0..k each logged once
    ss = [e["superstep"] for e in store.lineage()]
    assert ss == sorted(ss) and len(set(ss)) == len(ss)


def test_cc_resume_after_convergence_is_noop(spark, tmp_path):
    g = Graph.from_edges(toy_edges(spark, FIVE_VERTEX))
    store = CheckpointStore(str(tmp_path / "cc"))
    first = connected_components(g, store=store)
    assert first.converged
    n_lineage = len(store.lineage())
    again = connected_components(g, store=store)
    assert again.converged
    # no extra supersteps were executed on resume of a finished run
    assert len(store.lineage()) == n_lineage
    assert {r.id: r.comp for r in again.state.collect()} == {
        r.id: r.comp for r in first.state.collect()
    }


def test_kcore_kill_and_resume(spark, tmp_path):
    """Mutation-op resumability (SURVEY §7 hard part): kill the k-core
    edge-rebuild loop mid-decomposition, resume from the store, reach
    the identical core as the uninterrupted run."""
    import numpy as np

    from okapi_spark.operators.kcore import kcore

    rng = np.random.default_rng(17)
    edges = []
    # a 3-core clique plus peel-away chains (several peel rounds)
    for a in range(1, 8):
        for b in range(a + 1, 8):
            edges.append((a, b, 1.0))
    tip = 7
    for _ in range(12):
        edges.append((tip, tip + 1, 1.0))
        tip += 1
    for s, d, w in list(edges):
        edges.append((d, s, w))
    g = Graph.from_edges(toy_edges(spark, edges))

    golden = kcore(g, k=4)
    want = sorted(r.id for r in golden.vertices().collect())
    assert want  # the clique survives

    store = CheckpointStore(str(tmp_path / "kcore"))
    partial = kcore(g, k=4, max_rounds=1, store=store)  # "crash" after round 0
    assert store.latest()["superstep"] == 0
    resumed = kcore(g, k=4, store=store)
    got = sorted(r.id for r in resumed.vertices().collect())
    assert got == want
    ss = [e["superstep"] for e in store.lineage()]
    assert ss == sorted(ss) and len(set(ss)) == len(ss)
