"""CF ranking family — cf/ranking/* (AbstractCFRankingComputation's
4-superstep sample→send→update→apply cycle, :103-135).

* **Popularity** (PopularityRankingComputation.java:44-68): item score
  = number of raters; "factors" are the 1-D popularity so the shared
  Precision@k evaluator works unchanged.
* **Random** (RandomRankingComputation.java:51-62): random item/user
  vectors — the evaluation floor. Hash-derived, deterministic.
* **BPR** (BPRRankingComputation.java:25-60): Bayesian Personalized
  Ranking — per iteration each user draws a (positive, sampled
  negative) item pair and applies the AUC gradient
  ``σ(-x_uij)`` with x_uij = p_u·(q_i − q_j):
      p_u += γ(σ(−x)·(q_i − q_j) − λ p_u)
      q_i += γ(σ(−x)·p_u − λ q_i)
      q_j += γ(−σ(−x)·p_u − λ q_j)
  The reference samples with an unseeded RNG worker-side; here the
  per-(user, iteration) sample is hash-derived so runs are
  deterministic and partitioning-independent. Item updates within an
  iteration are aggregated (batch-synchronous), matching the
  reference's message-accumulated deltas (:103-135).

CLiMF / TFMAP (ClimfRankingComputation.java, TFMAPRankingComputation
.java) share this harness with different per-pair gradients; they are
TODO hooks (`NotImplementedError`) pending round-2 — the sampling,
message, and update plumbing below is the part they share.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def popularity_ranking(ratings: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Returns (user_factors, item_factors) with 1-D popularity scores
    (item: #raters; user: constant 1 so dot = popularity)."""
    itf = (
        ratings.groupBy(F.col("item").alias("id"))
        .agg(F.count("*").cast("double").alias("pop"))
        .select("id", F.array("pop").alias("factors"))
    )
    uf = ratings.select(F.col("user").alias("id")).distinct().select(
        "id", F.array(F.lit(1.0)).alias("factors")
    )
    return uf, itf


def random_ranking(ratings: DataFrame, vector_size: int = 10, seed: int = 42) -> tuple[DataFrame, DataFrame]:
    """Deterministic random vectors — the baseline floor."""

    def mk(ids: DataFrame, salt: str) -> DataFrame:
        cols = [
            (
                F.pmod(F.xxhash64("id", F.lit(f"{salt}:{i}"), F.lit(seed)), F.lit(10**9)).cast("double")
                / 1e9 - 0.5
            ).alias(f"f{i}")
            for i in range(vector_size)
        ]
        return ids.select("id", F.array(*cols).alias("factors"))

    return (
        mk(ratings.select(F.col("user").alias("id")).distinct(), "u"),
        mk(ratings.select(F.col("item").alias("id")).distinct(), "i"),
    )


def bpr_ranking(
    ratings: DataFrame,
    vector_size: int = 10,
    iterations: int = 30,
    gamma: float = 0.05,
    lambda_: float = 0.01,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """Batch-synchronous BPR. Returns (user_factors, item_factors)."""
    ratings = ratings.select(
        F.col("user").cast("long"), F.col("item").cast("long")
    ).distinct().persist(StorageLevel.MEMORY_AND_DISK)
    users = ratings.select(F.col("user").alias("id")).distinct()
    items = ratings.select(F.col("item").alias("id")).distinct()
    item_ids = [r.id for r in items.collect()]  # item universe for sampling
    n_items = len(item_ids)

    def mk(ids, salt):
        cols = [
            (
                F.pmod(F.xxhash64("id", F.lit(f"{salt}:{i}"), F.lit(seed)), F.lit(10**9)).cast("double")
                / 1e9 * 0.1
            ).alias(f"f{i}")
            for i in range(vector_size)
        ]
        return ids.select("id", F.array(*cols).alias("factors"))

    uf, itf = mk(users, "u"), mk(items, "i")
    spark = ratings.sparkSession
    item_universe = spark.createDataFrame([(x,) for x in item_ids], "item long")

    for it in range(iterations):
        # full epoch: every rated (user, item) is a positive; a
        # hash-derived negative is drawn per pair per iteration
        pos = ratings.select("user", F.col("item").alias("pos"))
        # negative sample: hash-pick from the universe, rejecting rated
        cand = pos.withColumn(
            "negidx", F.pmod(F.xxhash64("user", "pos", F.lit(f"neg{it}"), F.lit(seed)), F.lit(n_items))
        ).withColumn("neg", F.element_at(F.array(*[F.lit(x) for x in item_ids]), F.col("negidx").cast("int") + 1))
        # reject collisions with rated items by probing +1,+2,... (3 probes)
        for probe in range(3):
            hit = (
                cand.join(ratings.withColumnRenamed("item", "neg"), ["user", "neg"], "left_semi")
                .select("user", "pos").withColumn("bump", F.lit(1))
            )
            cand = (
                cand.join(hit, ["user", "pos"], "left")
                .withColumn("negidx", F.when(F.col("bump").isNotNull(),
                                             F.pmod(F.col("negidx") + 1, F.lit(n_items))).otherwise(F.col("negidx")))
                .withColumn("neg", F.element_at(F.array(*[F.lit(x) for x in item_ids]), F.col("negidx").cast("int") + 1))
                .drop("bump")
            )
        triples = cand.select("user", "pos", "neg")

        j = (
            triples.join(uf.withColumnRenamed("id", "user").withColumnRenamed("factors", "pu"), "user")
            .join(itf.withColumnRenamed("id", "pos").withColumnRenamed("factors", "qi"), "pos")
            .join(itf.withColumnRenamed("id", "neg").withColumnRenamed("factors", "qj"), "neg")
        )

        def grad(pdf: pd.DataFrame) -> pd.DataFrame:
            rows = []
            for _, r in pdf.iterrows():
                pu, qi, qj = (np.asarray(r["pu"]), np.asarray(r["qi"]), np.asarray(r["qj"]))
                x = float(pu @ (qi - qj))
                s = 1.0 / (1.0 + np.exp(x))  # σ(−x)
                rows.append(("u", int(r["user"]), list(gamma * (s * (qi - qj) - lambda_ * pu))))
                rows.append(("i", int(r["pos"]), list(gamma * (s * pu - lambda_ * qi))))
                rows.append(("i", int(r["neg"]), list(gamma * (-s * pu - lambda_ * qj))))
            return pd.DataFrame(rows, columns=["kind", "id", "delta"])

        deltas = j.groupBy(F.pmod(F.xxhash64("user"), F.lit(64)).alias("g")).applyInPandas(
            lambda pdf: grad(pdf), "kind string, id long, delta array<double>"
        ).persist(StorageLevel.MEMORY_AND_DISK)

        def apply_deltas(state: DataFrame, kind: str) -> DataFrame:
            agg = (
                deltas.filter(F.col("kind") == kind)
                .select("id", F.posexplode("delta").alias("pos", "dv"))
                .groupBy("id", "pos").agg(F.sum("dv").alias("d"))
                .groupBy("id").agg(F.array_sort(F.collect_list(F.struct("pos", "d"))).alias("p"))
                .select("id", F.transform("p", lambda s: s["d"]).alias("delta"))
            )
            return (
                state.join(agg, "id", "left")
                .select(
                    "id",
                    F.when(F.col("delta").isNotNull(),
                           F.zip_with("factors", "delta", lambda a, b: a + b))
                    .otherwise(F.col("factors")).alias("factors"),
                )
                .localCheckpoint(eager=True)
            )

        uf = apply_deltas(uf, "u")
        itf = apply_deltas(itf, "i")
        deltas.unpersist()
    return uf, itf


def climf_ranking(*args, **kwargs):  # pragma: no cover
    raise NotImplementedError(
        "CLiMF (ClimfRankingComputation.java:31-64, MRR gradient) shares the "
        "bpr_ranking harness; gradient slot pending"
    )


def tfmap_ranking(*args, **kwargs):  # pragma: no cover
    raise NotImplementedError(
        "TFMAP (TFMAPRankingComputation.java:32-51, MAP gradient) shares the "
        "bpr_ranking harness; gradient slot pending"
    )
