"""Connected components — HashMin/HCC min-label propagation.

Reference semantics (graphs/ConnectedComponents.java:42-97): component
id = minimum vertex id reachable; a vertex updates to the min of its
own label and incoming neighbor labels, and propagates ONLY on
improvement (send-on-change, lines 80-94) — the frontier shrinks every
superstep, converging when no label changes. Exact integer fixpoint.

Spark plan per superstep — two physical strategies, same fixpoint:

* broadcast mode (auto when |V| ≤ ``broadcast_threshold``): edges
  cached partitioned by dst, frontier broadcast into the src join →
  groupBy(dst).min is partition-complete, ZERO shuffle exchanges.
* shuffle mode (cluster-scale |V|): edges cached in the degree-
  proportional SALTED (src, salt) layout (plans.skew — hub edge lists
  otherwise serialize the join behind one task); the frontier explodes
  over each vertex's shard count, shuffles into the co-partitioned
  join, and groupBy(dst) shuffles messages (map-side partial min =
  Giraph's combiner). Because HashMin's frontier is send-on-change it
  SHRINKS every superstep, so once the previous round's changed-count
  drops under ``BROADCAST_FRONTIER_ROWS`` the loop flips the frontier
  side to a broadcast join adaptively — late supersteps on a
  10^10-vertex graph still get the cheap plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from okapi_spark.bsp import BSPResult, CheckpointStore, no_adaptive, run_supersteps
from okapi_spark.graph.graph import Graph
from okapi_spark.plans.broadcast import auto_state_broadcast

# below this many frontier rows, hint a broadcast join into the scatter
BROADCAST_FRONTIER_ROWS = 2_000_000


def _cc_pack(edges_pdf):
    """Per-partition pack for the staged csr blocks: edges sorted by
    dst so the kernel's per-dst min is a segment-reduce."""
    import numpy as np

    dst = edges_pdf["dst"].to_numpy()
    order = np.argsort(dst, kind="stable")
    return {
        "dst": dst[order].astype("int64", copy=False),
        "src": edges_pdf["src"].to_numpy()[order].astype("int64", copy=False),
    }


def _csr_min_comp(
    spark, num_blocks: int, num_tasks: int, epoch: int, block_dir: str,
    frontier: DataFrame, bcast_slot: list, n_rows: int,
) -> DataFrame:
    """HashMin scatter over RESIDENT staged CSR blocks (same design as
    lpa/pagerank mode='csr', plans/csr_blocks.py): the SHRINKING
    changed-frontier ships as two sorted NumPy arrays via
    ``sc.broadcast``; each superstep is a P-row mapInPandas job that
    memmaps its dst-sorted block, gathers the frontier comps into the
    edges whose src IS on the frontier (sparse searchsorted gather —
    send-on-change falls out of the mask), and emits per-dst minima
    via ``np.minimum.reduceat``. Zero exchange, zero edge rescan."""
    import pandas as pd

    from okapi_spark.operators.pagerank import _gather_state_arrays
    from okapi_spark.plans.csr_blocks import load_block, pid_frame

    b = spark.sparkContext.broadcast(
        _gather_state_arrays(frontier, n_rows=n_rows, value_col="comp", value_dtype="int64")
    )
    if bcast_slot[0] is not None:
        bcast_slot[0].destroy()
    bcast_slot[0] = b

    def kernel(pdf_iter):
        import numpy as np

        for pdf in pdf_iter:
            for pid in pdf["pid"].tolist():
                blk = load_block("cc", epoch, int(pid), block_dir)
                sid, scomp = b.value
                if blk is None or len(blk["dst"]) == 0 or len(sid) == 0:
                    continue
                src, dst = blk["src"], blk["dst"]
                pos = np.searchsorted(sid, src)
                np.clip(pos, 0, len(sid) - 1, out=pos)
                valid = sid[pos] == src  # src on the changed frontier
                if not valid.any():
                    continue
                dst_v = dst[valid]  # dst-sorted layout survives the mask
                comp_v = scomp[pos[valid]]
                starts = np.flatnonzero(np.r_[True, dst_v[1:] != dst_v[:-1]])
                cand = np.minimum.reduceat(comp_v, starts)
                yield pd.DataFrame({"id": dst_v[starts], "cand": cand})

    return pid_frame(spark, num_blocks, num_tasks).mapInPandas(
        kernel, schema="id long, cand long"
    )


def _cc_csr_fused(
    spark, graph, vertices, n, max_supersteps, num_partitions, ensure_staged, n_edges,
) -> BSPResult:
    """The whole HashMin fixpoint in ONE Spark job (round 6; the same
    fuse-the-supersteps move as PageRank's ``_pagerank_csr_fused``):
    a single task holds every memoized staged block, so it iterates
    rounds locally — frontier gather, per-dst ``minimum.reduceat``,
    merge — until a round changes nothing, instead of paying the
    per-round job floor. Integer min everywhere: the fixpoint and the
    per-round changed counts are bit-identical to every other plan."""
    import time

    import numpy as np
    import pandas as pd

    from okapi_spark.bsp import no_adaptive
    from okapi_spark.operators.pagerank import _ids_sorted
    from okapi_spark.plans.csr_blocks import load_block, pid_frame, resolved_arrays

    bdir, epoch = ensure_staged()
    ids = _ids_sorted(graph, vertices, n)
    b = spark.sparkContext.broadcast(ids)

    def kernel(pdf_iter):
        import numpy as np

        sid = b.value
        nn = len(sid)
        comp = sid.copy()  # initial component = own id
        changed = np.ones(nn, dtype=bool)  # round-0 frontier = all
        blocks = []
        for pdf in pdf_iter:
            for pid in pdf["pid"].tolist():
                blk = load_block("cc", epoch, int(pid), bdir)
                if blk is not None and len(blk["dst"]):
                    # frontier gather positions are round- AND
                    # call-invariant — memoized as sidecar files
                    res = resolved_arrays(
                        "cc", epoch, int(pid), bdir, ["spos"],
                        lambda: {"spos": np.searchsorted(sid, blk["src"])},
                    )
                    blocks.append((res["spos"], blk["dst"]))
        mets = []
        for _ss in range(max_supersteps):
            t0 = time.time()
            new_comp = comp.copy()
            new_changed = np.zeros(nn, dtype=bool)
            for spos, dst in blocks:
                valid = changed[spos]
                if not valid.any():
                    continue
                dst_v = dst[valid]  # dst-sorted layout survives the mask
                comp_v = comp[spos[valid]]
                starts = np.flatnonzero(np.r_[True, dst_v[1:] != dst_v[:-1]])
                cand = np.minimum.reduceat(comp_v, starts)
                tgt = np.searchsorted(sid, dst_v[starts])
                m = cand < comp[tgt]
                new_comp[tgt[m]] = cand[m]
                new_changed[tgt[m]] = True
            comp, changed = new_comp, new_changed
            n_changed = int(np.count_nonzero(changed))
            mets.append((n_changed, time.time() - t0))
            if n_changed == 0:
                break
        yield pd.DataFrame({
            "comp": [comp.tobytes()],
            "metrics": [np.asarray(mets, dtype="float64").tobytes()],
        })

    with no_adaptive(spark):
        try:
            row = (
                pid_frame(spark, num_partitions, 1)
                .mapInPandas(kernel, schema="comp binary, metrics binary")
                .collect()[0]
            )
        finally:
            b.destroy()
    comp = np.frombuffer(row.comp, dtype="int64")
    mets = np.frombuffer(row.metrics, dtype="float64").reshape(-1, 2)
    log = []
    converged = False
    for ss in range(mets.shape[0]):
        c = int(mets[ss, 0])
        halted = c == 0
        log.append({
            "changed": c,
            "edges_processed": n_edges,
            "_halted": halted,
            "superstep_sec": float(mets[ss, 1]),
            "superstep": ss,
        })
        if halted:
            converged = True
    state = spark.createDataFrame(
        pd.DataFrame({"id": ids, "comp": comp}), schema="id long, comp long"
    )
    return BSPResult(state, (log[-1]["superstep"] + 1) if log else 0, converged, log)


def connected_components(
    graph: Graph,
    max_supersteps: int = 200,
    store: CheckpointStore | None = None,
    num_partitions: int | None = None,
    state_broadcast: bool | None = None,
    broadcast_threshold: int | None = None,
    frontier_broadcast_rows: int | None = None,
    mode: str = "auto",
) -> BSPResult:
    """Returns BSPResult state (id long, comp long).

    ``state_broadcast``: force the zero-exchange broadcast plan (True),
    the two-shuffle cluster-scale plan (False), or auto by |V| vs
    ``broadcast_threshold`` (None). In shuffle mode the frontier is
    still broadcast adaptively once its row count (known exactly from
    the previous superstep's changed-metric) drops below
    ``BROADCAST_FRONTIER_ROWS``.

    ``mode="auto"`` (default, round 6): the fused staged-kernel loop
    (whole fixpoint in one Spark job over memoized CSR blocks, see
    ``_cc_csr_fused``) when byte-safe and |E| is inside the fuse
    window; else "sql". HashMin is integer min, so every plan reaches
    the bit-identical fixpoint.

    ``mode="csr"``: HashMin over resident staged CSR blocks (see
    ``_csr_min_comp``) — identical fixpoint, parity-tested; gated by
    the same broadcast byte budget since the round-0 frontier is |V|
    rows.
    """
    if mode not in ("auto", "sql", "csr"):
        raise ValueError(f"unknown connected_components mode {mode!r}")
    spark = graph.edges.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism

    # memoized vertex dictionary (Graph.derived) — rebuilt per call
    # before round 6
    vertices = graph.vertices_by_id(num_partitions)
    n = graph.num_vertices()  # scalar memo — no per-call count job
    if mode == "auto":
        from okapi_spark.operators.pagerank import _FUSE_MAX_EDGES

        fusable = (
            store is None
            and graph.num_edges() <= _FUSE_MAX_EDGES
            and auto_state_broadcast(n, row_bytes=32, rows_override=broadcast_threshold)
        )
        mode = "csr" if fusable else "sql"
    if state_broadcast is None:
        # byte-based gate (kcore.py precedent; VERDICT r3 #4): (id, comp)
        # state ~32B/row incl. broadcast-relation overhead vs 256MB budget
        state_broadcast = auto_state_broadcast(n, row_bytes=32, rows_override=broadcast_threshold)
    if frontier_broadcast_rows is None:
        frontier_broadcast_rows = BROADCAST_FRONTIER_ROWS

    if mode == "csr" and not auto_state_broadcast(
        n, row_bytes=32, rows_override=broadcast_threshold
    ):
        raise ValueError(
            f"mode='csr' broadcasts the changed frontier each superstep and the "
            f"round-0 frontier is |V|={n} rows, exceeding the broadcast budget "
            f"(threshold={broadcast_threshold}). Use the salted shuffle plan "
            "(state_broadcast=False) at cluster-scale |V|."
        )

    n_edges = graph.num_edges()
    restore_fn = None
    from okapi_spark.operators.pagerank import _EPOCH_COUNTER

    epoch = next(_EPOCH_COUNTER)
    bcast_slot: list = [None]
    if mode == "csr":
        # dst-hashed block layout; staged lazily on first superstep
        # (plans/csr_blocks.py — see lpa.py mode='csr' for the design),
        # MEMOIZED on the Graph (round 6, like by_dst/pr_blocks)
        from okapi_spark.plans.csr_blocks import (
            choose_task_count, cleanup_blocks, default_block_dir, stage_blocks,
        )

        # stage WIDE (one block per partition); supersteps run over
        # fewer tasks when the graph is small (see pid_frame)
        k_tasks = choose_task_count(n_edges, num_partitions)

        def _stage() -> tuple[str, int]:
            edges_by_pid = (
                graph.edges.select("src", "dst")
                .withColumn("pid", F.pmod(F.xxhash64("dst"), F.lit(num_partitions)).cast("int"))
                .repartition(num_partitions, "pid")
            )
            bdir = default_block_dir(spark)
            with no_adaptive(spark):
                staged = stage_blocks(
                    edges_by_pid, num_partitions, _cc_pack, "cc", epoch, bdir
                )
            assert staged == n_edges, f"staged {staged} edge rows != |E|={n_edges}"
            return bdir, epoch

        def ensure_staged() -> tuple[str, int]:
            return graph.derived(
                ("cc_blocks", num_partitions),
                _stage,
                cleanup=lambda v: cleanup_blocks(v[0]),
            )

        if store is None:
            from okapi_spark.operators.pagerank import _FUSE_MAX_EDGES

            if n_edges <= _FUSE_MAX_EDGES:
                return _cc_csr_fused(
                    spark, graph, vertices, n, max_supersteps, num_partitions,
                    ensure_staged, n_edges,
                )

        state0 = vertices.select("id", F.col("id").alias("comp"), F.lit(True).alias("changed"))
    elif state_broadcast:
        # dst-partitioned scatter layout: frontier broadcast + partition-
        # complete min-agg ⇒ zero shuffle exchanges per superstep
        edges = graph.by_dst(num_partitions).select("src", "dst")
        # superstep 0 of the reference folds the local min over
        # neighbors; here the uniform loop does it — same fixpoint,
        # one extra round.
        state0 = vertices.select("id", F.col("id").alias("comp"), F.lit(True).alias("changed"))
    else:
        # cluster-scale: SALTED (src, salt) layout (plans.skew) — the
        # early-round frontier is ~|V| rows and a power-law hub's edge
        # list in one task would skew-bind the join exactly as in
        # pagerank's fallback; degree-proportional sharding rebalances
        # it, and the shrinking frontier still flips to a broadcast
        # join below frontier_broadcast_rows
        from okapi_spark.plans.skew import shard_count_expr

        degw = graph.edges.groupBy("src").agg(F.count("*").alias("out_deg"))
        nsalt_expr = shard_count_expr("out_deg", num_partitions, n_edges)
        edges = (
            graph.edges.join(degw, "src")
            .select(
                "src", "dst",
                F.pmod(F.xxhash64("dst"), nsalt_expr).cast("int").alias("salt"),
            )
            .repartition(num_partitions, "src", "salt")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        # AQE off for the one-time cache fill (see lpa.py: Spark 4.1.2
        # TableCacheQueryStageExec recache race on this plan shape)
        with no_adaptive(graph.edges.sparkSession):
            edges.count()
        nsalt_map = degw.select(F.col("src").alias("id"), nsalt_expr.alias("nsalt"))
        state0 = vertices.join(nsalt_map, "id", "left").select(
            "id", F.col("id").alias("comp"), F.lit(True).alias("changed"),
            F.coalesce("nsalt", F.lit(1)).alias("nsalt"),
        )

        # nsalt is plan-dependent; re-derive on checkpoint resume
        def restore_fn(df: DataFrame) -> DataFrame:
            return df.drop("nsalt").join(nsalt_map, "id", "left").select(
                "id", "comp", "changed", F.coalesce("nsalt", F.lit(1)).alias("nsalt")
            )

    # frontier size from the previous superstep's metric (|V| at ss 0)
    last_changed = [n]

    def superstep(ss: int, state: DataFrame):
        if mode == "csr":
            bdir, staged_epoch = ensure_staged()
            msgs = _csr_min_comp(
                spark, num_partitions, k_tasks, staged_epoch, bdir,
                state.filter("changed").select("id", "comp"),
                bcast_slot, n_rows=last_changed[0],
            )
        elif state_broadcast or last_changed[0] <= frontier_broadcast_rows:
            frontier = F.broadcast(
                state.filter("changed").select(F.col("id").alias("src"), "comp")
            )
            joined = edges.join(frontier, "src")
        else:
            # explode the frontier over each vertex's shard count and
            # equi-join on (src, salt) — co-partitioned with the cached
            # salted edge layout; shuffle_hash streams the edges (no
            # SortMergeJoin re-sort; see pagerank.py shuffle branch)
            from okapi_spark.plans.skew import explode_shards

            frontier = explode_shards(
                state.filter("changed"), "src", "comp"
            ).hint("shuffle_hash")
            joined = edges.join(frontier, ["src", "salt"])
        if mode != "csr":
            msgs = joined.groupBy(F.col("dst").alias("id")).agg(F.min("comp").alias("cand"))
        keep = [state["nsalt"]] if (mode == "sql" and not state_broadcast) else []
        new_state = state.join(msgs, "id", "left").select(
            "id",
            F.least("comp", F.coalesce("cand", "comp")).alias("comp"),
            (F.coalesce("cand", "comp") < F.col("comp")).alias("changed"),
            *keep,
        )

        def post(materialized: DataFrame) -> dict:
            n_changed = materialized.filter("changed").count()
            last_changed[0] = n_changed
            return {"changed": n_changed, "edges_processed": n_edges}

        return new_state, post

    from contextlib import nullcontext

    with no_adaptive(spark) if (state_broadcast or mode == "csr") else nullcontext():
        res = run_supersteps(
            state0,
            superstep,
            max_supersteps=max_supersteps,
            halt_fn=lambda ss, m: m["changed"] == 0,
            store=store,
            restore_fn=restore_fn,
        )
    res.state = res.state.select("id", "comp")
    if bcast_slot[0] is not None:
        bcast_slot[0].destroy()
        bcast_slot[0] = None
    return res
