"""SybilRank — graphs/SybilRank.java:44-351 (OSN sybil detection).

Semantics (verified against the reference source):
* totalTrust defaults to N = number of vertices (:146-152).
* Init (:125-141): trusted vertices get rank totalTrust/|trusted|,
  others 0; every vertex scatters rank·w/deg along its edges where
  deg = Σ edge weights (:95-101 computeDegree).
* Power iteration (:163-189): newRank = Σ incoming; scatter
  newRank·w/deg; stored value = newRank/deg (degree-normalized).
* Exactly ⌈c·log10(N)⌉ power iterations (:227-234), c =
  sybilrank.iteration.multiplier (default 1).

Spark: identical scatter joins as weighted PageRank without teleport;
trusted seeds come from a side table (SybilRankVertexValueInputFormat
:321-350 analogue).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from okapi_spark.bsp import BSPResult, no_adaptive, run_supersteps
from okapi_spark.graph.graph import Graph
from okapi_spark.plans.broadcast import auto_state_broadcast


def sybilrank(
    graph: Graph,
    trusted: DataFrame,
    iteration_multiplier: float = 1.0,
    total_trust: float | None = None,
    state_broadcast: bool | None = None,
    broadcast_threshold: int | None = None,
) -> BSPResult:
    """trusted: (id long). Returns state (id long, rank double) where
    rank is the degree-normalized trust after the final iteration.

    ``state_broadcast``: the trust state is |V| rows every power
    iteration, so the zero-exchange broadcast plan is auto-gated on
    estimated state bytes vs the shared 256MB budget
    (plans/broadcast.py; ``broadcast_threshold`` overrides with an
    explicit row count); above it the classic two-shuffle plan runs
    (state shuffles into the src join, map-side partial sum combines
    messages).
    """
    spark = graph.edges.sparkSession
    vertices = graph.vertices().persist(StorageLevel.MEMORY_AND_DISK)
    n = vertices.count()
    if total_trust is None:
        total_trust = float(n)
    if state_broadcast is None:
        # byte-budgeted gate (plans/broadcast.py, CC/LPA/PageRank
        # precedent): (id, send) ~ 32B/row vs the 256MB budget
        state_broadcast = auto_state_broadcast(n, row_bytes=32, rows_override=broadcast_threshold)
    n_trusted = trusted.select("id").distinct().count()
    if n_trusted == 0:
        raise ValueError("sybilrank needs at least one trusted vertex")
    power_iterations = int(math.ceil(iteration_multiplier * math.log10(n))) or 1

    deg = graph.edges.groupBy(F.col("src").alias("id")).agg(F.sum("weight").alias("deg"))
    shares = graph.edges.join(deg.withColumnRenamed("id", "src"), "src").select(
        "src", "dst", (F.col("weight") / F.col("deg")).alias("share")
    )
    # broadcast mode: dst-partitioned scatter layout (see Graph.by_dst);
    # shuffle mode: src layout so the state equi-join co-locates on src
    shares = shares.repartition("dst" if state_broadcast else "src").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    shares.count()

    init_rank = F.when(F.col("is_trusted"), total_trust / n_trusted).otherwise(0.0)
    state0 = (
        vertices.join(trusted.select("id").distinct().withColumn("is_trusted", F.lit(True)), "id", "left")
        .select("id", init_rank.alias("send"))
    )

    def superstep(ss: int, state: DataFrame):
        sends = state.select("id", "send").withColumnRenamed("id", "src")
        if state_broadcast:
            sends = F.broadcast(sends)
        else:
            # stream cached edges vs per-partition trust hash (no SMJ
            # re-sort of the edge set; see pagerank.py shuffle branch)
            sends = sends.hint("shuffle_hash")
        recv = (
            shares.join(sends, "src")
            .select("dst", (F.col("send") * F.col("share")).alias("m"))
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("m").alias("recv"))
        )
        new_state = vertices.join(recv, "id", "left").select(
            "id", F.coalesce("recv", F.lit(0.0)).alias("send")
        )
        return new_state, {}

    from contextlib import nullcontext

    with no_adaptive(spark) if state_broadcast else nullcontext():
        res = run_supersteps(state0, superstep, max_supersteps=power_iterations)
    final = res.state.join(deg, "id", "left").select(
        "id",
        F.when(F.col("deg") > 0, F.col("send") / F.col("deg")).otherwise(0.0).alias("rank"),
    )
    res.state = final
    return res
