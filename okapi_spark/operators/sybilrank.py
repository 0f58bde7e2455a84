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
    mode: str = "sql",
    num_partitions: int | None = None,
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

    ``mode="csr"``: the scatter is weighted-PageRank-shaped, so the
    resident-staged-block kernel is PageRank's own
    ``_csr_messages_bcast`` over the trust shares — zero exchange,
    zero edge rescan (plans/csr_blocks.py); same byte gate.
    """
    if mode not in ("sql", "csr"):
        raise ValueError(f"unknown sybilrank mode {mode!r}")
    spark = graph.edges.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    # memoized vertex dictionary (Graph.derived) — was a per-call
    # persist that leaked across calls before round 6
    vertices = graph.vertices_by_id(num_partitions)
    n = graph.num_vertices()  # scalar memo — no per-call count job
    if total_trust is None:
        total_trust = float(n)
    if mode == "csr" and not auto_state_broadcast(
        n, row_bytes=32, rows_override=broadcast_threshold
    ):
        raise ValueError(
            f"mode='csr' broadcasts the full trust state each superstep; "
            f"|V|={n} exceeds the broadcast budget "
            f"(threshold={broadcast_threshold}). Use mode='sql'."
        )
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
    from okapi_spark.operators.pagerank import _EPOCH_COUNTER

    epoch = next(_EPOCH_COUNTER)
    bcast_slot: list = [None]
    if mode == "csr":
        # same staged layout and kernel as pagerank mode='csr' — and
        # MEMOIZED on the Graph (round 6, like pr_blocks/sp_blocks):
        # the trust-share blocks are a pure layout of the edge set
        from okapi_spark.operators.pagerank import _pr_pack
        from okapi_spark.plans.csr_blocks import (
            choose_task_count, cleanup_blocks, default_block_dir, stage_blocks,
        )

        n_edges = graph.num_edges()
        k_tasks = choose_task_count(n_edges, num_partitions)

        def _stage() -> tuple[str, int]:
            stage_epoch = next(_EPOCH_COUNTER)
            shares_by_pid = (
                shares.withColumn(
                    "pid", F.pmod(F.xxhash64("dst"), F.lit(num_partitions)).cast("int")
                ).repartition(num_partitions, "pid")
            )
            bdir = default_block_dir(spark)
            with no_adaptive(spark):
                staged = stage_blocks(
                    shares_by_pid, num_partitions, _pr_pack, "sr", stage_epoch, bdir
                )
            assert staged == n_edges, f"staged {staged} share rows != |E|={n_edges}"
            return bdir, stage_epoch

        def ensure_staged() -> tuple[str, int]:
            return graph.derived(
                ("sr_blocks", num_partitions),
                _stage,
                cleanup=lambda v: cleanup_blocks(v[0]),
            )
    else:
        # broadcast mode: dst-partitioned scatter layout (see
        # Graph.by_dst); shuffle mode: src layout so the state
        # equi-join co-locates on src
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
        if mode == "csr":
            from okapi_spark.operators.pagerank import _csr_messages_bcast

            bdir, staged_epoch = ensure_staged()
            recv = _csr_messages_bcast(
                spark, num_partitions, k_tasks, staged_epoch, bdir,
                state.select("id", F.col("send").alias("rank")),
                bcast_slot, n_rows=n, tag="sr",
            ).select(F.col("dst").alias("id"), F.col("msum").alias("recv"))
        else:
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

    res = None
    if mode == "csr":
        from okapi_spark.operators.pagerank import (
            _FUSE_MAX_EDGES, _ids_sorted, _pagerank_csr_fused,
        )

        if n_edges <= _FUSE_MAX_EDGES:
            # ALL power iterations in ONE Spark job (round 6): the
            # update is exactly weighted PageRank's fused kernel with
            # base=0, damping=1 — ``0.0 + 1.0·msum`` is IEEE-identical
            # to the per-iteration plan's ``coalesce(recv, 0)``, so the
            # trust vector is bit-identical by construction.
            import numpy as np

            bdir, staged_epoch = ensure_staged()
            ids = _ids_sorted(graph, vertices, n)
            t_ids = np.asarray(
                sorted(r.id for r in trusted.select("id").distinct().collect()),
                dtype="int64",
            )
            ranks0 = np.zeros(n, dtype="float64")
            if len(t_ids) and n:
                pos = np.searchsorted(ids, t_ids)
                np.clip(pos, 0, n - 1, out=pos)
                valid = ids[pos] == t_ids  # seeds absent from V drop out
                ranks0[pos[valid]] = total_trust / n_trusted
            res = _pagerank_csr_fused(
                spark, ids, ranks0, n, 0.0, 1.0, 0.0, "max",
                power_iterations, power_iterations, num_partitions,
                staged_epoch, bdir, n_edges, tag="sr",
            )
            res.state = res.state.withColumnRenamed("rank", "send")
    if res is None:
        with no_adaptive(spark) if (state_broadcast or mode == "csr") else nullcontext():
            res = run_supersteps(state0, superstep, max_supersteps=power_iterations)
    if bcast_slot[0] is not None:
        bcast_slot[0].destroy()
        bcast_slot[0] = None
    final = res.state.join(deg, "id", "left").select(
        "id",
        F.when(F.col("deg") > 0, F.col("send") / F.col("deg")).otherwise(0.0).alias("rank"),
    )
    res.state = final
    return res
