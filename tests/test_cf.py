"""Collaborative filtering: ALS golden kernel (AlsTest.java:32-63),
end-to-end convergence, SGD improvement, Precision@k sanity."""

from __future__ import annotations

import numpy as np
import pytest

from okapi_spark.operators.cf import als, als_update_value, precision_at_k, sgd

# FIXTURES.md §3.4 bipartite ratings graph (AlsTest.java:67-72)
RATINGS = [(1, 1, 1.0), (1, 2, 2.0), (2, 1, 3.0), (2, 2, 4.0)]


def test_als_update_value_reference_golden():
    """Exact reference golden: 3×4 system → {2.598314, 4.297752, 4.311797}."""
    mat_m = np.array(
        [[0.2, 0.1, 0.3, 0.1],
         [0.1, 0.1, 0.1, 0.1],
         [0.4, 0.1, 0.3, 0.3]]
    )
    mat_r = np.array([[1.0], [2.0], [3.0], [4.0]])
    u = als_update_value(np.array([0.1, 0.2, 0.3]), mat_m, mat_r, 0.01)
    np.testing.assert_allclose(u, [2.598314, 4.297752, 4.311797], atol=1e-5)


def test_als_end_to_end(spark):
    df = spark.createDataFrame(RATINGS, "user long, item long, rating double")
    uf, itf, log = als(df, vector_size=2, iterations=8)
    # AlsTest.java:87: 4 factor rows total (2 users + 2 items)
    assert uf.count() + itf.count() == 4
    assert all(len(r.factors) == 2 for r in uf.collect())
    # rmse decreases and gets small on this trivially factorizable matrix
    assert log[-1] < 0.2 and log[-1] <= log[0]


def test_als_deterministic(spark):
    df = spark.createDataFrame(RATINGS, "user long, item long, rating double")
    _, _, log1 = als(df, vector_size=2, iterations=3)
    _, _, log2 = als(df, vector_size=2, iterations=3)
    assert log1 == log2


def test_sgd_improves_rmse(spark):
    df = spark.createDataFrame(RATINGS, "user long, item long, rating double")
    uf, itf, log = sgd(df, vector_size=2, iterations=10, gamma=0.05)
    assert log[-1] < log[0]


def test_precision_at_k(spark):
    """Low-rank ground truth: ALS must rank each user's best unseen
    items above random unseen items."""
    rng = np.random.default_rng(2)
    n_users, n_items, rank = 20, 30, 3
    U = rng.normal(size=(n_users, rank))
    V = rng.normal(size=(n_items, rank))
    R = U @ V.T
    # scale to [1, 5]
    R = 1 + 4 * (R - R.min()) / (R.max() - R.min())
    ratings, test = [], []
    for u in range(n_users):
        unseen = []
        for i in range(n_items):
            if rng.random() < 0.6:
                ratings.append((u + 1, i + 1, float(round(R[u, i], 3))))
            else:
                unseen.append(i)
        # relevant = the user's 2 best unseen items by TRUE rating
        best = sorted(unseen, key=lambda i: -R[u, i])[:2]
        test += [(u + 1, i + 1) for i in best]
    df = spark.createDataFrame(ratings, "user long, item long, rating double")
    uf, itf, _ = als(df, vector_size=rank, iterations=12)
    rel = spark.createDataFrame(test, "user long, item long")
    p = precision_at_k(uf, itf, rel, k=5, num_samples=20, rated=df.select("user", "item"))
    # random baseline: 2 relevant among ~12 unseen candidates → E[p] ≈ 2·(5/12)/5 = 0.17
    assert p > 0.25, p
