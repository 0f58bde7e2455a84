"""Independent recomputation checks for the golden-snapshot trio.

VERDICT r3 "Next round #2": the goldens were recorded by the engine,
so partition-invariance alone proves determinism, not correctness.
tests/ref_impl.py re-derives each operator sequentially in pure
Python/NumPy from the reference semantics (Spinner.java:259-418,
Svdpp.java:368-500, SemiClustering.java:60-360); these tests assert
the Spark engine's gate-query outputs equal that independent
derivation at the gate's scale factor — closing the self-reference.

Also pins the pure-Python XXH64 (the shared randomness convention)
bit-exactly against Spark's builtin ``xxhash64``.
"""

from __future__ import annotations

import math
import os
import sys

import numpy as np
import pytest
from pyspark.sql import functions as F

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import __spark_entry__ as entrymod  # noqa: E402
from ref_impl import (  # noqa: E402
    hash_uniform,
    ratings_table,
    ref_semiclustering,
    ref_spinner,
    ref_svdpp,
    spark_xxhash64,
    weighted_copurchase_edges,
)

SF_DIR = "/root/testdata/sf0.01"


def test_xxh64_matches_spark_builtin(spark):
    """The reimplemented XXH64 chain must agree with Spark's expression
    for every (type, length) shape the engine's conventions use:
    long column, int literal, string literals of assorted lengths."""
    df = spark.createDataFrame(
        [(0,), (1,), (-1,), (42,), (2**40 + 7,), (-(2**35),), (999_999_937,)],
        "id long",
    )
    cases = [
        (F.xxhash64("id"), lambda v: spark_xxhash64(("long", v))),
        (F.xxhash64("id", F.lit(5)), lambda v: spark_xxhash64(("long", v), ("int", 5))),
        (F.xxhash64("id", F.lit(3), F.lit(42)),
         lambda v: spark_xxhash64(("long", v), ("int", 3), ("int", 42))),
        (F.xxhash64("id", F.lit("user:b"), F.lit(42)),
         lambda v: spark_xxhash64(("long", v), "user:b", ("int", 42))),
        (F.xxhash64("id", F.lit("item:w2"), F.lit(42)),
         lambda v: spark_xxhash64(("long", v), "item:w2", ("int", 42))),
        (F.xxhash64(F.lit("a")), lambda v: spark_xxhash64("a")),
        (F.xxhash64(F.lit("a fairly long string over thirty-two bytes!")),
         lambda v: spark_xxhash64("a fairly long string over thirty-two bytes!")),
        (F.xxhash64(F.lit("12345678")), lambda v: spark_xxhash64("12345678")),
        (F.xxhash64(F.lit("1234")), lambda v: spark_xxhash64("1234")),
    ]
    rows = df.select("id", *[c.alias(f"h{i}") for i, (c, _) in enumerate(cases)]).collect()
    for r in rows:
        for i, (_, pyfn) in enumerate(cases):
            assert r[f"h{i}"] == pyfn(r["id"]), f"case {i} id={r['id']}"


def test_hash_uniform_matches_engine_expression(spark):
    df = spark.range(50).select(F.col("id").cast("long").alias("id"))
    got = df.select(
        "id",
        (F.pmod(F.xxhash64("id", F.lit(4), F.lit(5)), F.lit(10**9)).cast("double") / 1e9).alias("u"),
    ).collect()
    for r in got:
        assert r["u"] == hash_uniform(("long", r["id"]), ("int", 4), ("int", 5))


def test_spinner_matches_independent_impl(spark):
    """spinner_8 gate query (k=8, 8 rounds, seed 5) — integer labels,
    exact equality with the sequential reference-semantics rerun."""
    got = {
        int(r["id"]): int(r["part"])
        for r in entrymod.queries()["spinner_8"](spark, SF_DIR).collect()
    }
    want = ref_spinner(
        weighted_copurchase_edges(SF_DIR), k=8, max_iterations=8, seed=5
    )
    assert len(got) == len(want)
    diff = {v: (got[v], want[v]) for v in want if got[v] != want[v]}
    assert not diff, f"{len(diff)} vertices differ, e.g. {list(diff.items())[:5]}"


def test_svdpp_matches_independent_impl(spark):
    """svdpp_1 gate query (3 factors, 1 iteration) — full item state
    (baseline, factors, weights) against the sequential rerun; 1e-9
    tolerance absorbs summation-order float drift (the engine's item
    fold is a closed-form power sum, the oracle's the literal
    sequential decay loop)."""
    from okapi_spark.operators.svdpp import svdpp

    sp = entrymod._ratings(spark, SF_DIR)
    _, itf, _ = svdpp(sp, vector_size=3, iterations=1)
    got = {
        int(r["id"]): (float(r["baseline"]), list(r["factors"]), list(r["weights"]))
        for r in itf.collect()
    }
    _, items = ref_svdpp(ratings_table(SF_DIR), vector_size=3, iterations=1)
    assert set(got) == set(items)
    for it, (ib, q, y) in items.items():
        gb, gq, gy = got[it]
        assert math.isclose(gb, ib, rel_tol=0, abs_tol=1e-9), f"item {it} baseline"
        np.testing.assert_allclose(gq, q, atol=1e-9, err_msg=f"item {it} factors")
        np.testing.assert_allclose(gy, y, atol=1e-9, err_msg=f"item {it} weights")


def test_semiclustering_matches_independent_impl(spark):
    """semicluster_2 gate query (2 supersteps) — full cluster sets
    (vertex tuples + scores) against the sequential rerun."""
    from okapi_spark.operators.semiclustering import semi_clustering

    out = semi_clustering(entrymod._weighted_graph(spark, SF_DIR), iterations=2)
    got = {
        int(r["id"]): [
            (tuple(c["vs"]), c["inner"], c["boundary"], c["score"]) for c in r["clusters"]
        ]
        for r in out.collect()
    }
    want = ref_semiclustering(weighted_copurchase_edges(SF_DIR), iterations=2)
    assert set(got) == set(want)
    for v, clusters in want.items():
        gc = got[v]
        assert len(gc) == len(clusters), f"vertex {v}: cluster count"
        for (gvs, gi, gb, gs), (wvs, wi, wb, ws) in zip(gc, clusters):
            assert tuple(sorted(gvs)) == wvs, f"vertex {v}: cluster membership"
            assert math.isclose(gi, wi, abs_tol=1e-9)
            assert math.isclose(gb, wb, abs_tol=1e-9)
            assert math.isclose(gs, ws, abs_tol=1e-9)


# ---------------------------------------------------------------------------
# round 5: the formerly pytest-only operators, now golden-gated — each
# gate query checked against its pure-Python ref_impl recomputation
# ---------------------------------------------------------------------------

def test_jaccard_minhash_matches_independent_impl(spark):
    """jaccard_minhash gate query — per-vertex (incident-edge count,
    Σ 16·sim) checksum; sims are multiples of 1/16 so equality is
    exact-integer."""
    from ref_impl import ref_jaccard_minhash

    got = {
        int(r["id"]): (int(r["n_edges"]), int(r["sum_sim16"]))
        for r in entrymod.queries()["jaccard_minhash"](spark, SF_DIR).collect()
    }
    want = ref_jaccard_minhash(SF_DIR, num_hashes=16)
    assert got == want


def test_random_ranking_matches_independent_impl(spark):
    from ref_impl import ref_random_ranking

    got = {
        int(r["id"]): [r["f0"], r["f1"], r["f2"], r["f3"]]
        for r in entrymod.queries()["random_rank"](spark, SF_DIR).collect()
    }
    _, items = ref_random_ranking(ratings_table(SF_DIR), vector_size=4)
    assert set(got) == set(items)
    for i, vec in items.items():
        np.testing.assert_allclose(got[i], vec, atol=1e-12, err_msg=f"item {i}")


def _check_gate_factors(spark, name: str, ref_fn):
    """Shared engine-vs-ref comparison for the 2-D factor gates:
    item factors via the gate projection (6dp-rounded), 1.01e-6
    tolerance absorbing engine-vs-sequential summation-order drift."""
    import __spark_entry__ as em

    got = {
        int(r["id"]): [float(r["f0"]), float(r["f1"])]
        for r in em.queries()[name](spark, SF_DIR).collect()
    }
    _, items = ref_fn(ratings_table(SF_DIR), vector_size=2, iterations=2)
    assert set(got) == set(items)
    for i, vec in items.items():
        np.testing.assert_allclose(
            got[i], [round(float(vec[0]), 6), round(float(vec[1]), 6)],
            atol=1.01e-6, err_msg=f"{name} item {i}",
        )


def test_sgd_matches_independent_impl(spark):
    """sgd_2 gate query (Sgd.java:162-192 semantics, deterministic
    fold order) vs the sequential recomputation."""
    from ref_impl import ref_sgd

    _check_gate_factors(spark, "sgd_2", ref_sgd)


def test_bpr_matches_independent_impl(spark):
    """bpr_2 gate query (BPRRankingComputation.java:25-60; hash-drawn
    negatives, batch-accumulated deltas) vs the sequential rerun."""
    from ref_impl import ref_bpr

    _check_gate_factors(spark, "bpr_2", ref_bpr)


def test_climf_matches_independent_impl(spark):
    """climf_2 gate query (paper-gradient CLiMF) vs the per-pair-loop
    sequential recomputation."""
    from ref_impl import ref_climf

    _check_gate_factors(spark, "climf_2", ref_climf)


def test_tfmap_matches_independent_impl(spark):
    """tfmap_2 gate query (smoothed-MAP gradient, relevant + sampled
    irrelevant buffer) vs the sequential recomputation."""
    from ref_impl import ref_tfmap

    _check_gate_factors(spark, "tfmap_2", ref_tfmap)


# ---------------------------------------------------------------------------
# round 5: non-default hyperparameter points — the independent oracle
# pins the PROTOCOL, not one configuration (VERDICT r4 "next round #8")
# ---------------------------------------------------------------------------

def test_spinner_repartition_variant_matches_independent_impl(spark):
    """Spinner k=4 WITH up-scale repartition adaptation (+2 labels):
    exercises the Repartitioner init path (Spinner.java:467-524) and a
    different label-space width than the gate query."""
    from okapi_spark.operators.lpa import spinner_partition

    res = spinner_partition(
        entrymod._weighted_graph(spark, SF_DIR),
        k=4, repartition=2, max_iterations=6, seed=7,
    )
    got = {int(r["id"]): int(r["part"]) for r in res.state.collect()}
    want = ref_spinner(
        weighted_copurchase_edges(SF_DIR),
        k=4, repartition=2, max_iterations=6, seed=7,
    )
    assert len(got) == len(want)
    diff = {v: (got[v], want[v]) for v in want if got[v] != want[v]}
    assert not diff, f"{len(diff)} vertices differ, e.g. {list(diff.items())[:5]}"


def test_semiclustering_capacity_variant_matches_independent_impl(spark):
    """Semi-clustering with cluster_capacity=6 / max_clusters=3 —
    the union/extend/trim kernel at a different trim point."""
    from okapi_spark.operators.semiclustering import semi_clustering

    out = semi_clustering(
        entrymod._weighted_graph(spark, SF_DIR),
        iterations=2, max_clusters=3, cluster_capacity=6,
    )
    got = {
        int(r["id"]): [
            (tuple(c["vs"]), c["inner"], c["boundary"], c["score"]) for c in r["clusters"]
        ]
        for r in out.collect()
    }
    want = ref_semiclustering(
        weighted_copurchase_edges(SF_DIR),
        iterations=2, max_clusters=3, cluster_capacity=6,
    )
    assert set(got) == set(want)
    for v, clusters in want.items():
        gc = got[v]
        assert len(gc) == len(clusters), f"vertex {v}: cluster count"
        for (gvs, gi, gb, gs), (wvs, wi, wb, ws) in zip(gc, clusters):
            assert tuple(sorted(gvs)) == wvs, f"vertex {v}: cluster membership"
            assert math.isclose(gi, wi, abs_tol=1e-9)
            assert math.isclose(gb, wb, abs_tol=1e-9)
            assert math.isclose(gs, ws, abs_tol=1e-9)
