"""Reference experiment-path parity: train → evaluate → report.

The reference ships a Luigi pipeline (bin/runOkapi.py:32-348) that
trains each CF ranking model as a Giraph job, evaluates Precision@5
with 100 sampled negatives in a second job, and spits the aggregator
value — producing the README's Movielens table (README.md:44-51:
Random 0.1529, Pop 0.7554, BPR 0.2412).

This script is the same experiment re-expressed over the engine: a
leave-one-out split of the ratings derived from the sf testdata
(orders ⋈ lineitem), every ranking model trained in-process, and the
shared Precision@5 / MRR evaluators (cf/eval semantics: hash-sampled
unrated negatives, k=5) producing one table.

Two data regimes:

* ``planted`` (default) — deterministic Zipf-skewed implicit feedback
  (low item ids popular, held-out items follow the popularity draw):
  the Movielens-like regime of the reference's table, where the
  expected ordering Popularity >> pairwise-rankers >= Random is
  reproducible.
* an sf_dir path — ratings derived from orders ⋈ lineitem. TPC-H keys
  are uniform-random, so this regime carries NO preference signal:
  every model lands at the sampled-negative floor (~k_rel/(100+k_rel))
  with Popularity marginally above. Kept as the honest null control.

Usage: python scripts/ranking_experiment.py [planted|sf_dir] [vector_size] [iters]

Sweep mode (the OkapiAutotuning hook re-expressed — reference
cf/annotations/*: HyperParameter ranges consumed by a tuning driver):
    python scripts/ranking_experiment.py --sweep MODEL "GRID"
with GRID like "learnRate=0.01,0.05;reg=0.001,0.01" using the
reference parameterNames from okapi_spark.hyperparams.REGISTRY; each
grid point trains on the planted split and reports P@5 + MRR.
    python scripts/ranking_experiment.py --info   # AnnotationsInfo JSON
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import Window
from pyspark.sql import functions as F


def _planted(spark, n_users: int = 400, n_items: int = 80, per_user: int = 12, seed: int = 5):
    """Zipf-skewed implicit feedback (low item ids popular) with a
    deterministic-random rated item held out per user — the
    PrepareMovielensData split analogue (bin/runOkapi.py:153-200).
    Held items follow the rating distribution but each item keeps the
    bulk of its train raters, so train popularity remains a predictor
    (holding out each user's MOST popular item instead would crush
    exactly the items the test asks about)."""
    import hashlib

    import numpy as np

    rng = np.random.default_rng(seed)
    rows = set()
    for u in range(1, n_users + 1):
        for _ in range(per_user):
            i = min(n_items, 1 + int(rng.zipf(1.7)) % n_items)
            rows.add((u, i, 1.0))
    train, test = [], []
    for u in range(1, n_users + 1):
        mine = sorted(r for r in rows if r[0] == u)
        if len(mine) > 2:
            hold = max(
                mine,
                key=lambda r: hashlib.md5(f"{r[0]}:{r[1]}:{seed}".encode()).hexdigest(),
            )
            test.append((hold[0], hold[1]))
            train += [r for r in mine if r != hold]
        else:
            train += mine
    return (
        spark.createDataFrame(train, "user long, item long, rating double"),
        spark.createDataFrame(test, "user long, item long"),
    )


def sweep(model: str, grid_spec: str) -> None:
    """Grid sweep over a registered model's declared hyperparameter
    ranges (AnnotationsInfo-driven search-space contract)."""
    from okapi_spark.hyperparams import grid_points, resolve, validate_grid
    from okapi_spark.operators.cf import mean_reciprocal_rank, precision_at_k
    from okapi_spark.session import get_spark

    grid = {}
    for part in grid_spec.split(";"):
        pname, vals = part.split("=")
        grid[pname.strip()] = [float(v) for v in vals.split(",")]
    kwarg_grid = validate_grid(model, grid)  # range-checked, kwarg-mapped
    fit = resolve(model)

    spark = get_spark(app_name=f"sweep_{model}")
    train, test = _planted(spark)
    train, test = train.persist(), test.persist()
    print(f"{'params':40s} {'P@5':>8s} {'MRR':>8s} {'train_s':>8s}")
    best = None
    for point in grid_points(kwarg_grid):
        kw = {k: (int(v) if k in ("vector_size", "iterations") else v) for k, v in point.items()}
        t0 = time.time()
        uf, itf = fit(train, **kw)
        uf, itf = uf.persist(), itf.persist()
        p5 = precision_at_k(uf, itf, test, k=5, num_samples=100, rated=train)
        mrr = mean_reciprocal_rank(uf, itf, test, num_samples=100, rated=train)
        print(f"{str(kw):40s} {p5:8.4f} {mrr:8.4f} {time.time() - t0:8.1f}")
        if best is None or p5 > best[1]:
            best = (kw, p5)
        uf.unpersist(), itf.unpersist()
    print(f"best: {best[0]} P@5={best[1]:.4f}")
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--info":
        from okapi_spark.hyperparams import to_json

        print(to_json(sys.argv[2] if len(sys.argv) > 2 else None))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--sweep":
        sweep(sys.argv[2], sys.argv[3])
        return
    source = sys.argv[1] if len(sys.argv) > 1 else "planted"
    vector_size = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    from okapi_spark.operators.cf import mean_reciprocal_rank, precision_at_k
    from okapi_spark.operators.ranking import (
        bpr_ranking,
        climf_ranking,
        popularity_ranking,
        random_ranking,
        tfmap_ranking,
    )
    from okapi_spark.session import get_spark

    spark = get_spark(app_name="ranking_experiment")

    if source == "planted":
        train, test = _planted(spark)
        train, test = train.persist(), test.persist()
    else:
        sf_dir = source
        o = spark.read.parquet(f"{sf_dir}/orders.parquet").select("o_orderkey", "o_custkey")
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_orderkey", "l_partkey")
        ratings = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy(F.col("o_custkey").alias("user"), F.col("l_partkey").alias("item"))
            .agg(F.count("*").cast("double").alias("rating"))
            .persist()
        )
        # leave-one-out split (deterministic): each user's hash-max item
        # is held out as the relevant test item
        h = F.xxhash64("user", "item", F.lit(7))
        ranked = ratings.withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("user").orderBy(F.desc(h), F.asc("item"))),
        )
        test = ranked.filter("rn = 1").select("user", "item").persist()
        train = ranked.filter("rn > 1").select("user", "item", "rating").persist()
    n_train, n_test = train.count(), test.count()
    print(f"ratings split: train={n_train} test={n_test} (leave-one-out)")

    models = {
        "Random": lambda: random_ranking(train, vector_size),
        "Popularity": lambda: popularity_ranking(train),
        "BPR": lambda: bpr_ranking(train, vector_size, iters),
        "CLiMF": lambda: climf_ranking(train, vector_size, iters),
        "TFMAP": lambda: tfmap_ranking(train, vector_size, iters),
    }
    print(f"{'model':12s} {'P@5':>8s} {'MRR':>8s} {'train_s':>8s}")
    for name, fit in models.items():
        t0 = time.time()
        uf, itf = fit()
        uf, itf = uf.persist(), itf.persist()
        p5 = precision_at_k(uf, itf, test, k=5, num_samples=100, rated=train)
        mrr = mean_reciprocal_rank(uf, itf, test, num_samples=100, rated=train)
        print(f"{name:12s} {p5:8.4f} {mrr:8.4f} {time.time() - t0:8.1f}")
    spark.stop()


if __name__ == "__main__":
    main()
