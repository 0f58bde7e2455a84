"""Label propagation — classic LPA and Spinner's balanced variant.

Classic LPA (community detection): every vertex starts with its own
id as label; each synchronous round it adopts the label with the
highest total incoming edge weight, ties broken by the SMALLEST label
— fully deterministic and partitioning-independent. (The reference's
Spinner, spinner/Spinner.java:186-204, builds exactly this
neighbor-label histogram before applying its balance penalty.)

Synchronous LPA can 2-cycle on bipartite structures, so the loop
halts on no-change OR on a repeat of the previous changed-count with
``max_supersteps`` as the backstop; a fixed ``iterations`` mode exists
for oracle parity (the DuckDB oracle unrolls the same rounds).

Balanced mode (``spinner_partition``) implements Spinner's scoring
(spinner/Spinner.java:259-290): score(v, l) = freq(l in nbrhood)/deg
− λ·load(l)/capacity, with per-label loads collected driver-side each
round (the persistent-aggregator feedback loop, :586-597) and
probabilistic migration damped by remaining capacity (:341-418) made
deterministic via hash-derived per-(vertex, round) uniforms.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from okapi_spark.bsp import BSPResult, CheckpointStore, no_adaptive, run_supersteps
from okapi_spark.plans.broadcast import auto_state_broadcast
from okapi_spark.graph.graph import Graph


def _lpa_pack(edges_pdf):
    """Per-partition CSR pack (runs once, inside ``stage_blocks``):
    edges sorted by dst so the kernel's fused-key sort sees grouped
    runs. Stable sort preserves the incoming row order within a dst —
    the same float-accumulation order the unstaged kernel had."""
    import numpy as np

    dst = edges_pdf["dst"].to_numpy()
    order = np.argsort(dst, kind="stable")
    return {
        "dst": dst[order].astype("int64", copy=False),
        "src": edges_pdf["src"].to_numpy()[order].astype("int64", copy=False),
        "w": edges_pdf["weight"].to_numpy()[order].astype("float64", copy=False),
    }


def _block_label_hist(blk, sid, slbl):
    """Neighbor-label weight histogram over one packed block: group by
    (dst, label-of-src) via a sorted segment-reduce (fused-key sort +
    add.reduceat) instead of the JVM hash aggregation — the hash agg
    touches up-to-|E| distinct (dst, lbl) groups through random
    access, which is what DRAM-binds the sql plans at 10^8-edge scale
    (BENCH.md "LPA broadcast floor decomposition"); the sort is
    sequential-bandwidth-friendly. Returns (grp_dst, grp_lbl, sums)."""
    import numpy as np

    dst_sorted, src_sorted, w_sorted = blk["dst"], blk["src"], blk["w"]
    lab = slbl[np.searchsorted(sid, src_sorted)]  # gather src labels
    # Both keys are vertex ids < maxv, so below ~3×10⁹ vertices the
    # pair packs into one int64 and a single argsort replaces the
    # two-pass lexsort (~2× less per-superstep sort bandwidth —
    # this sort is the kernel's hot loop, paid every round because
    # labels change; the dst-sorted pack is paid once at staging).
    maxv = int(sid[-1]) + 1 if len(sid) else 1
    if maxv <= (1 << 31):
        order = np.argsort(dst_sorted * maxv + lab)
    else:
        order = np.lexsort((lab, dst_sorted))
    g_dst = dst_sorted[order]
    g_lbl = lab[order]
    g_w = w_sorted[order]
    grp = np.flatnonzero(np.r_[True, (g_dst[1:] != g_dst[:-1]) | (g_lbl[1:] != g_lbl[:-1])])
    sums = np.add.reduceat(g_w, grp)
    return g_dst[grp], g_lbl[grp], sums


def _lpa_block_argmax(blk, sid, slbl):
    """Pure-NumPy LPA superstep over one packed block: the
    ``_block_label_hist`` histogram followed by the per-dst argmax.

    Tie semantics match ``_argmax_label`` exactly: max summed weight,
    then smallest label. (Weight sums are compared as float64 in both
    plans.) Returns (dst ids, best labels)."""
    import numpy as np

    grp_dst, grp_lbl, sums = _block_label_hist(blk, sid, slbl)
    # per-dst argmax with min-label tie-break over the group sums
    dgrp = np.flatnonzero(np.r_[True, grp_dst[1:] != grp_dst[:-1]])
    wmax = np.maximum.reduceat(sums, dgrp)
    # broadcast each dst's max back over its groups
    seg_id = np.zeros(len(sums), dtype=np.int64)
    seg_id[dgrp[1:]] = 1
    seg_id = np.cumsum(seg_id)
    is_max = sums == wmax[seg_id]
    cand = np.where(is_max, grp_lbl, np.iinfo(np.int64).max)
    best = np.minimum.reduceat(cand, dgrp)
    return grp_dst[dgrp], best


def _csr_best_labels(
    spark, num_blocks: int, num_tasks: int, epoch: int, block_dir: str,
    state: DataFrame, bcast_slot: list, n_rows: int,
) -> DataFrame:
    """North-rule kernel superstep over RESIDENT CSR blocks: the edge
    layout (pmod(xxhash64(dst), P) — every in-edge of a dst lives in
    ONE partition, so the per-dst argmax is FINAL, zero message
    exchange) was packed and staged ONCE by ``csr_blocks.stage_blocks``;
    each superstep is a P-row ``mapInPandas`` job whose tasks load
    block i from the worker-global cache (or the page-cached block
    file) — ZERO edge bytes cross the JVM↔Arrow boundary per superstep,
    which was the unstaged form's 5-8× absolute-throughput tax
    (BENCH.md "LPA csr kernel"). The only per-superstep traffic is the
    label state, shipped as two sorted NumPy arrays via
    ``sc.broadcast``."""
    import pandas as pd

    from okapi_spark.operators.pagerank import _gather_state_arrays
    from okapi_spark.plans.csr_blocks import load_block, pid_frame

    b = spark.sparkContext.broadcast(
        _gather_state_arrays(state, n_rows=n_rows, value_col="lbl", value_dtype="int64")
    )
    if bcast_slot[0] is not None:
        bcast_slot[0].destroy()
    bcast_slot[0] = b

    def kernel(pdf_iter):
        for pdf in pdf_iter:
            for pid in pdf["pid"].tolist():
                blk = load_block("lpa", epoch, int(pid), block_dir)
                if blk is None or len(blk["dst"]) == 0:
                    continue
                sid, slbl = b.value
                ids, best = _lpa_block_argmax(blk, sid, slbl)
                yield pd.DataFrame({"id": ids, "new_lbl": best})

    return pid_frame(spark, num_blocks, num_tasks).mapInPandas(
        kernel, schema="id long, new_lbl long"
    )


def _csr_label_hist(
    spark, num_blocks: int, num_tasks: int, epoch: int, block_dir: str,
    state: DataFrame, bcast_slot: list, n_rows: int, tag: str = "spin",
) -> DataFrame:
    """Spinner's ComputeNewPartition histogram over RESIDENT staged CSR
    blocks: emits the full (dst, neighbor-partition, Σw) table — the
    same rows as the sql plan's ``edges ⋈ labels → groupBy(dst, spart)``
    — via ``_block_label_hist``'s sorted segment-reduce. The |V|-scale
    scoring/migration logic downstream stays in SQL unchanged, so the
    protocol (including the hash-uniform migration coin flips) is
    byte-identical between modes; only this |E|-scale job moves off the
    JVM hash-agg path. Zero exchange, zero edge rescan."""
    import pandas as pd

    from okapi_spark.operators.pagerank import _gather_state_arrays
    from okapi_spark.plans.csr_blocks import load_block, pid_frame

    b = spark.sparkContext.broadcast(
        _gather_state_arrays(state, n_rows=n_rows, value_col="lbl", value_dtype="int64")
    )
    if bcast_slot[0] is not None:
        bcast_slot[0].destroy()
    bcast_slot[0] = b

    def kernel(pdf_iter):
        for pdf in pdf_iter:
            for pid in pdf["pid"].tolist():
                blk = load_block(tag, epoch, int(pid), block_dir)
                if blk is None or len(blk["dst"]) == 0:
                    continue
                sid, slbl = b.value
                grp_dst, grp_lbl, sums = _block_label_hist(blk, sid, slbl)
                yield pd.DataFrame(
                    {"id": grp_dst, "cand": grp_lbl.astype("int32"), "w": sums}
                )

    return pid_frame(spark, num_blocks, num_tasks).mapInPandas(
        kernel, schema="id long, cand int, w double"
    )


def _csr_active_dsts(
    spark, num_blocks: int, num_tasks: int, epoch: int, block_dir: str,
    moved: DataFrame, bcast_slot: list, n_rows: int, tag: str = "spin",
) -> DataFrame:
    """Spinner's isActive gating over RESIDENT staged blocks: the set
    of vertices with at least one migrated in-neighbor (the sql plan's
    ``edges ⋈ moved → distinct(dst)``). Each block's dst set is
    disjoint from every other block's (dst-hash layout), so the
    per-block distinct is globally distinct — no exchange needed."""
    import pandas as pd

    from okapi_spark.operators.pagerank import _gather_sorted_arrays
    from okapi_spark.plans.csr_blocks import load_block, pid_frame

    mv_ids, _ = _gather_sorted_arrays(moved, n_rows, [])
    b = spark.sparkContext.broadcast(mv_ids)
    if bcast_slot[0] is not None:
        bcast_slot[0].destroy()
    bcast_slot[0] = b

    def kernel(pdf_iter):
        import numpy as np

        for pdf in pdf_iter:
            for pid in pdf["pid"].tolist():
                blk = load_block(tag, epoch, int(pid), block_dir)
                mv = b.value
                if blk is None or len(blk["dst"]) == 0 or len(mv) == 0:
                    continue
                src, dst = blk["src"], blk["dst"]
                pos = np.searchsorted(mv, src)
                np.clip(pos, 0, len(mv) - 1, out=pos)
                valid = mv[pos] == src
                if not valid.any():
                    continue
                dst_v = dst[valid]  # dst-sorted ⇒ uniques are run starts
                uniq = dst_v[np.r_[True, dst_v[1:] != dst_v[:-1]]]
                yield pd.DataFrame({"id": uniq})

    return pid_frame(spark, num_blocks, num_tasks).mapInPandas(kernel, schema="id long")


def _lpa_csr_fused(
    spark, graph, vertices, n, iterations, num_partitions, ensure_staged,
) -> BSPResult:
    """Fixed-iteration LPA in ONE Spark job (round 6; the same
    fuse-the-supersteps move as PageRank's ``_pagerank_csr_fused``,
    gated on |E| ≤ its ``_FUSE_MAX_EDGES``): a single task holds every
    memoized staged block — together they own every in-edge — so it
    runs all rounds locally instead of paying the per-round mapInPandas
    job floor. Per-round math is ``_lpa_block_argmax`` verbatim, so the
    labels are bit-identical to the per-round csr loop (and to the sql
    plans on the parity-tested shapes)."""
    import time

    import numpy as np
    import pandas as pd

    from okapi_spark.operators.pagerank import _ids_sorted
    from okapi_spark.plans.csr_blocks import load_block, pid_frame

    from okapi_spark.plans.csr_blocks import resolved_arrays

    bdir, epoch = ensure_staged()
    ids = _ids_sorted(graph, vertices, n)
    b = spark.sparkContext.broadcast(ids)

    def kernel(pdf_iter):
        import numpy as np

        sid = b.value
        nn = len(sid)
        # work in INDEX space: labels as positions into the sorted id
        # array. sid is ascending, so index order IS id order — the
        # min-label tie-break carries over unchanged — and the fused
        # (dst_idx, lbl_idx) group key fits 32 bits for nn ≤ 46340,
        # where numpy's argsort is ~8x faster than on int64 keys
        # (measured 0.05s vs 0.42s on the 2.4M-edge bench block set;
        # the per-round sort is this kernel's hot loop).
        lbl = np.arange(nn, dtype=np.int64)  # initial label = own id
        blocks = []
        for pdf in pdf_iter:
            for pid in pdf["pid"].tolist():
                blk = load_block("lpa", epoch, int(pid), bdir)
                if blk is not None and len(blk["dst"]):
                    # gather/scatter positions are round- AND
                    # call-invariant — memoized as sidecar files
                    # (resolved_arrays; measured 0.42s/call re-resolve)
                    res = resolved_arrays(
                        "lpa", epoch, int(pid), bdir, ["spos", "dpos"],
                        lambda: {
                            "spos": np.searchsorted(sid, blk["src"]),
                            "dpos": np.searchsorted(sid, blk["dst"]).astype(np.int64),
                        },
                    )
                    blocks.append((res["spos"], res["dpos"], blk["w"]))
        use32 = nn <= 46340  # nn² < 2^31
        mets = []
        for _ss in range(iterations):
            t0 = time.time()
            new = lbl.copy()
            for spos, dpos, w in blocks:
                key = dpos * nn + lbl[spos]
                order = np.argsort(key.astype(np.int32) if use32 else key)
                g_key = key[order]
                g_w = w[order]
                grp = np.flatnonzero(np.r_[True, g_key[1:] != g_key[:-1]])
                sums = np.add.reduceat(g_w, grp)
                grp_dst = g_key[grp] // nn
                grp_lbl = g_key[grp] - grp_dst * nn
                # per-dst argmax, min-label tie-break (same math as
                # _lpa_block_argmax, in index space)
                dgrp = np.flatnonzero(np.r_[True, grp_dst[1:] != grp_dst[:-1]])
                wmax = np.maximum.reduceat(sums, dgrp)
                seg_id = np.zeros(len(sums), dtype=np.int64)
                seg_id[dgrp[1:]] = 1
                seg_id = np.cumsum(seg_id)
                is_max = sums == wmax[seg_id]
                cand = np.where(is_max, grp_lbl, np.iinfo(np.int64).max)
                best = np.minimum.reduceat(cand, dgrp)
                new[grp_dst[dgrp]] = best
            changed = int(np.count_nonzero(new != lbl))
            lbl = new
            mets.append((changed, time.time() - t0))
        yield pd.DataFrame({
            "labels": [sid[lbl].tobytes()],
            "metrics": [np.asarray(mets, dtype="float64").tobytes()],
        })

    with no_adaptive(spark):
        try:
            row = (
                pid_frame(spark, num_partitions, 1)
                .mapInPandas(kernel, schema="labels binary, metrics binary")
                .collect()[0]
            )
        finally:
            b.destroy()
    import numpy as np
    import pandas as pd

    lbl = np.frombuffer(row.labels, dtype="int64")
    mets = np.frombuffer(row.metrics, dtype="float64").reshape(-1, 2)
    log = [
        {
            "changed": int(mets[ss, 0]),
            "_halted": False,
            "superstep_sec": float(mets[ss, 1]),
            "superstep": ss,
        }
        for ss in range(mets.shape[0])
    ]
    state = spark.createDataFrame(
        pd.DataFrame({"id": ids, "lbl": lbl}), schema="id long, lbl long"
    )
    return BSPResult(state, iterations, False, log)


def _argmax_label(msgs: DataFrame, key: str = "id") -> DataFrame:
    """(key, lbl) with max weight, tie → min label: one hash agg via
    max(struct(w, -lbl)) — no window, no second shuffle."""
    return (
        msgs.groupBy(key)
        .agg(F.max(F.struct(F.col("w"), (-F.col("lbl")).alias("neg"))).alias("m"))
        .select(key, (-F.col("m.neg")).alias("new_lbl"))
    )


def label_propagation(
    graph: Graph,
    max_supersteps: int = 50,
    iterations: int | None = None,
    weighted: bool = True,
    store: CheckpointStore | None = None,
    num_partitions: int | None = None,
    state_broadcast: bool | None = None,
    broadcast_threshold: int | None = None,
    mode: str = "auto",
) -> BSPResult:
    """Classic synchronous LPA. Returns state (id long, lbl long).

    ``iterations``: run exactly that many rounds (oracle-parity mode);
    otherwise run to no-change / oscillation / max_supersteps.

    ``state_broadcast``: LPA's label state is a full |V|-row table
    every round (unlike CC there is no shrinking frontier), so the
    zero-exchange broadcast plan is only safe when |V| fits a
    broadcast — auto-selected vs ``broadcast_threshold``; above it the
    classic two-shuffle plan runs (state shuffles into the src join,
    histogram agg combines map-side).

    ``mode="auto"`` (default, round 6): the fused staged-kernel loop
    (all rounds in one Spark job over memoized CSR blocks — see
    ``_lpa_csr_fused``) when it is measured-better and byte-safe:
    fixed-iteration runs without a store, |E| within the fuse window,
    label state within the broadcast budget. Everything else resolves
    to "sql". Kernel math is shared with mode="csr", so results are
    bit-identical to it (and parity-tested against sql).

    ``mode="csr"``: partition-local sparse gather-scatter over
    CSR-packed adjacency blocks (see ``_csr_best_labels``) — the
    north-rule physical form. Identical results to the sql plans
    (parity-tested); same byte gate as the broadcast plan since the
    label state is NumPy-broadcast each superstep.
    """
    if mode not in ("auto", "sql", "csr"):
        raise ValueError(f"unknown lpa mode {mode!r}")
    spark = graph.edges.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    w_col = F.col("weight") if weighted else F.lit(1.0)

    # memoized vertex dictionary (Graph.derived) — rebuilt per call
    # before round 6
    vertices = graph.vertices_by_id(num_partitions)
    n = graph.num_vertices()  # scalar memo — no per-call count job
    if mode == "auto":
        from okapi_spark.operators.pagerank import _FUSE_MAX_EDGES

        fusable = (
            iterations is not None
            and store is None
            and graph.num_edges() <= _FUSE_MAX_EDGES
            and auto_state_broadcast(n, row_bytes=32, rows_override=broadcast_threshold)
        )
        mode = "csr" if fusable else "sql"
    if mode == "csr" and not auto_state_broadcast(
        n, row_bytes=32, rows_override=broadcast_threshold
    ):
        raise ValueError(
            f"mode='csr' broadcasts the full label state each superstep; "
            f"|V|={n} exceeds the broadcast budget "
            f"(threshold={broadcast_threshold}). Use the salted shuffle plan "
            "(state_broadcast=False) at cluster-scale |V|."
        )
    if state_broadcast is None:
        # byte-based gate (VERDICT r3 #4): label/part state ~32-40B/row
        state_broadcast = auto_state_broadcast(n, row_bytes=40, rows_override=broadcast_threshold)

    from okapi_spark.operators.pagerank import _EPOCH_COUNTER

    epoch = next(_EPOCH_COUNTER)
    salted = not state_broadcast and mode == "sql"
    restore_fn = None
    if mode == "csr":
        # pid = hash(dst): the partition owns ALL in-edges of its dsts,
        # so the kernel's per-dst argmax is final — zero exchange. The
        # packed blocks are staged to disk ONCE (one pass over the
        # edges, same I/O shape as a shuffle map write); supersteps
        # never scan the edge table again (csr_blocks module doc).
        # Staging is LAZY (first superstep) so re-invoking a completed
        # checkpointed run still resumes instantly without an edge pass,
        # and MEMOIZED on the Graph (round 6, like by_dst/pr_blocks) so
        # repeated calls skip the re-stage.
        from okapi_spark.plans.csr_blocks import (
            choose_task_count, cleanup_blocks, default_block_dir, stage_blocks,
        )

        # stage WIDE (one block per partition); supersteps run over
        # fewer tasks when the graph is small (see pid_frame)
        k_tasks = choose_task_count(graph.num_edges(), num_partitions)

        def _stage() -> tuple[str, int]:
            edges_by_pid = (
                graph.edges.select("src", "dst", w_col.alias("weight"))
                .withColumn("pid", F.pmod(F.xxhash64("dst"), F.lit(num_partitions)).cast("int"))
                .repartition(num_partitions, "pid")
            )
            bdir = default_block_dir(spark)
            with no_adaptive(spark):
                staged = stage_blocks(
                    edges_by_pid, num_partitions, _lpa_pack, "lpa", epoch, bdir
                )
            n_edges = graph.num_edges()
            assert staged == n_edges, f"staged {staged} edge rows != |E|={n_edges}"
            return bdir, epoch

        def ensure_staged() -> tuple[str, int]:
            return graph.derived(
                ("lpa_blocks", weighted, num_partitions),
                _stage,
                cleanup=lambda v: cleanup_blocks(v[0]),
            )

        state0 = vertices.select("id", F.col("id").alias("lbl"))
        if iterations is not None and store is None:
            from okapi_spark.operators.pagerank import _FUSE_MAX_EDGES

            if graph.num_edges() <= _FUSE_MAX_EDGES:
                return _lpa_csr_fused(
                    spark, graph, vertices, n, iterations, num_partitions,
                    ensure_staged,
                )
    elif state_broadcast:
        # dst-partitioned scatter layout (see Graph.by_dst): labels are
        # broadcast into the src join; groupBy(dst, lbl) and the argmax
        # groupBy(dst) are both partition-complete ⇒ zero exchanges
        edges = graph.by_dst(num_partitions).select("src", "dst", w_col.alias("weight"))
        state0 = vertices.select("id", F.col("id").alias("lbl"))
    else:
        # SALTED co-partitioned layout, same as pagerank's shuffle
        # fallback (plans.skew): a power-law hub's edge list in one
        # task makes the per-superstep join skew-bound; degree-
        # proportional (src, salt) sharding rebalances it, and only
        # the ~|V|-row exploded label state shuffles per superstep
        from okapi_spark.plans.skew import shard_count_expr

        n_edges = graph.num_edges()
        degw = graph.edges.groupBy("src").agg(F.count("*").alias("out_deg"))
        nsalt_expr = shard_count_expr("out_deg", num_partitions, n_edges)
        edges = (
            graph.edges.join(degw, "src")
            .select(
                "src", "dst", w_col.alias("weight"),
                F.pmod(F.xxhash64("dst"), nsalt_expr).cast("int").alias("salt"),
            )
            .repartition(num_partitions, "src", "salt")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        # AQE off for the one-time cache fill: the explicit
        # repartition(n) layout leaves AQE nothing to improve, and
        # Spark 4.1.2's TableCacheQueryStageExec occasionally dies in
        # CacheManager.recacheByPlan ("SparkPlan.session() is null")
        # while adaptively materializing a fresh cache — rare
        # subprocess-fatal race, observed on this exact plan shape
        with no_adaptive(graph.edges.sparkSession):
            edges.count()
        nsalt_map = degw.select(F.col("src").alias("id"), nsalt_expr.alias("nsalt"))
        state0 = vertices.join(nsalt_map, "id", "left").select(
            "id", F.col("id").alias("lbl"), F.coalesce("nsalt", F.lit(1)).alias("nsalt")
        )

        # nsalt is plan-dependent (current parallelism); re-derive on
        # checkpoint resume instead of trusting the persisted column
        # (same hazard as pagerank's salted fallback)
        def restore_fn(df: DataFrame) -> DataFrame:
            return df.drop("nsalt").join(nsalt_map, "id", "left").select(
                "id", "lbl", F.coalesce("nsalt", F.lit(1)).alias("nsalt")
            )

    bcast_slot: list = [None]

    def superstep(ss: int, state: DataFrame):
        if mode == "csr":
            bdir, staged_epoch = ensure_staged()
            best = _csr_best_labels(
                spark, num_partitions, k_tasks, staged_epoch, bdir,
                state, bcast_slot, n_rows=n,
            )
        elif state_broadcast:
            labels = F.broadcast(
                state.select(F.col("id").alias("src"), F.col("lbl").alias("slbl"))
            )
            joined = edges.join(labels, "src")
        else:
            from okapi_spark.plans.skew import explode_shards

            labels = (
                explode_shards(state, "src", "lbl")
                .withColumnRenamed("lbl", "slbl")
                .hint("shuffle_hash")
            )
            joined = edges.join(labels, ["src", "salt"])
        if mode != "csr":
            hist = (
                joined.groupBy(F.col("dst").alias("id"), F.col("slbl").alias("lbl"))
                .agg(F.sum("weight").alias("w"))
            )
            best = _argmax_label(hist)
        keep = [state["nsalt"]] if salted else []
        new_state = state.join(best, "id", "left").select(
            "id",
            F.coalesce("new_lbl", "lbl").alias("lbl"),
            (F.coalesce("new_lbl", "lbl") != F.col("lbl")).alias("changed"),
            *keep,
        )

        def post(materialized: DataFrame) -> dict:
            aggs = [F.count(F.when(F.col("changed"), F.lit(1))).alias("c")]
            if iterations is None:
                # order-insensitive state fingerprint (xor never
                # overflows, unlike an ANSI-mode long sum); ids are
                # unique so no (id,lbl) pair can self-cancel. Only
                # computed in convergence mode — fixed-iteration runs
                # have no halt check, so the full-state aggregation
                # would be pure per-superstep overhead.
                aggs.append(F.expr("bit_xor(xxhash64(id, lbl))").alias("h"))
            row = materialized.agg(*aggs).collect()[0]
            out = {"changed": int(row["c"])}
            if iterations is None:
                out["state_hash"] = int(row["h"])
            return out

        return new_state, post

    if iterations is not None:
        halt = None
        max_ss = iterations
    else:
        # oscillation ledger; on checkpoint resume, rehydrate it from
        # the store's lineage (each completed superstep logged its
        # state_hash) — otherwise a resumed oscillating run needs up
        # to one extra full cycle to re-detect the repeat
        seen: set[int] = set()
        if store is not None:
            seen = {
                int(e["metrics"]["state_hash"])
                for e in store.lineage()
                if "state_hash" in e.get("metrics", {})
            }

        def halt(ss: int, m: dict) -> bool:
            # oscillation = the exact label STATE repeats (bipartite
            # 2-cycles etc.); equal consecutive changed-COUNTS while
            # labels are still moving must NOT halt (their hashes differ)
            h = m["state_hash"]
            osc = h in seen
            seen.add(h)
            return m["changed"] == 0 or osc

        max_ss = max_supersteps

    from contextlib import nullcontext

    with no_adaptive(spark) if (state_broadcast or mode == "csr") else nullcontext():
        res = run_supersteps(state0, superstep, max_supersteps=max_ss, halt_fn=halt,
                             store=store, restore_fn=restore_fn)
    res.state = res.state.select("id", "lbl")
    if bcast_slot[0] is not None:
        # final state is materialized by run_supersteps; the last
        # superstep's label broadcast is no longer referenced
        bcast_slot[0].destroy()
        bcast_slot[0] = None
    return res


def spinner_partition(
    graph: Graph,
    k: int = 8,
    lam: float = 1.0,
    additional_capacity: float = 0.05,
    max_iterations: int = 290,
    threshold: float = 0.001,
    window: int = 5,
    seed: int = 42,
    prior: DataFrame | None = None,
    repartition: int = 0,
    num_partitions: int | None = None,
    state_broadcast: bool | None = None,
    broadcast_threshold: int | None = None,
    mode: str = "sql",
) -> BSPResult:
    """Spinner balanced k-way partitioning — spinner/Spinner.java:103-736,
    full protocol. state (id long, part int).

    ``mode="csr"``: the two |E|-scale jobs per round — the
    ComputeNewPartition histogram and the isActive gating — run over
    resident staged CSR blocks (``_csr_label_hist`` /
    ``_csr_active_dsts``); every |V|-scale scoring/migration step,
    including the hash-uniform coin flips, is the SAME SQL as
    mode='sql', so the protocol is identical by construction.

    Faithful pieces (reference file:line):

    * **Graph conversion**: ConverterPropagate → ConverterUpdateEdges
      (:431-448, :526-556) make the input undirected — here one
      ``Graph.symmetrize()``.
    * **Init** (:425-466): prior partitions loaded from a side table
      (``prior`` = SpinnerVertexValueInputFormat analogue, :919-954),
      unassigned vertices hash-assigned uniformly over [0, k).
    * **Repartition adaptation** (Repartitioner, :467-524): with
      ``repartition`` ≠ 0 the label space becomes k+repartition;
      down-scale moves orphaned vertices uniformly into the survivors,
      up-scale moves any vertex into a new label with probability
      repartition/(k+repartition).
    * **Score** (:259-290): H(v,l) = λ + freq(l)/Σw − λ·ceil₃(load(l)/C),
      loads in EDGE COUNTS (requestMigration/migrate aggregate
      numberOfEdges, :157-165/:352-366), C = |E|·(1+additionalCapacity)
      / (k+repartition) (:329-332), ceil₃ = ceil at 3 decimals
      (computeW, :148-152). Candidates are ALL labels (:267) — but for
      any label absent from the neighborhood H = λ(1−ceil₃(load/C)) is
      vertex-independent, so the per-round argmax over absent labels is
      one constant (min-load, min-index) candidate row per vertex
      instead of a |V|×k cross join. Ties prefer the current partition,
      then the smallest label (the reference's deterministic
      chooseMinLabelPartition, :226-240; its default random tie-break
      :206-224 is not reproducible).
    * **Active gating** (:295-313): a vertex requests migration only if
      a neighbor migrated in the previous round (isActive).
    * **Migration probability** (ComputeMigration.preSuperstep,
      :389-418): prob(l) = remaining(l)/demand(l) with remaining =
      C − load(l), 0 if demand = 0 or remaining ≤ 0 — the reference's
      actual damping, NOT a head-room fraction; demand = Σ numEdges of
      requesters (:161-162). Decided by hash-derived per-(vertex,
      round) uniforms for determinism.
    * **Counters** (:600-698): per-round migrations, local-edge %,
      max/min load unbalance, max normalized load, total score — in
      ``metrics_log``.
    * **Convergence** (algorithmConverged, :637-655): halt when
      |1 − score/max(last ``window`` scores)| < threshold, checked
      BEFORE the migration phase of the round (master halts the
      migration superstep, :700-736), after window warm-up.
    """
    if mode not in ("sql", "csr"):
        raise ValueError(f"unknown spinner mode {mode!r}")
    spark = graph.edges.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    k_total = k + repartition
    if k_total <= 0:
        raise ValueError("k + repartition must be positive")

    g = graph.symmetrize()
    deg = g.edges.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("deg"), F.sum("weight").alias("wdeg")
    )
    vertices = (
        g.vertices().join(deg, "id", "left")
        .select(
            "id",
            F.coalesce("deg", F.lit(0)).alias("deg"),
            F.coalesce("wdeg", F.lit(0.0)).alias("wdeg"),
        )
        .repartition(num_partitions, "id")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n = vertices.count()
    if mode == "csr" and not auto_state_broadcast(
        n, row_bytes=32, rows_override=broadcast_threshold
    ):
        raise ValueError(
            f"mode='csr' broadcasts the full partition state each round; "
            f"|V|={n} exceeds the broadcast budget "
            f"(threshold={broadcast_threshold}). Use mode='sql' "
            "(state_broadcast=False selects the shuffle plan)."
        )
    if state_broadcast is None:
        # byte-based gate (VERDICT r3 #4): label/part state ~32-40B/row
        state_broadcast = auto_state_broadcast(n, row_bytes=40, rows_override=broadcast_threshold)
    if mode == "csr":
        edges = None  # |E|-scale jobs run over the staged blocks
    else:
        edges = (g.by_dst(num_partitions) if state_broadcast else g.edges).select(
            "src", "dst", "weight"
        )
    # shuffle mode: per-partition hash build on the (big-|V|) state
    # side, streaming the cached edges — avoids a per-round SMJ re-sort
    _maybe_bcast = F.broadcast if state_broadcast else (lambda df: df.hint("shuffle_hash"))
    total_edges = g.num_edges()  # directed count of the symmetrized graph
    capacity = total_edges * (1.0 + additional_capacity) / k_total

    csr_fns = None
    block_slot: list = [None]
    lbl_slot: list = [None]
    mv_slot: list = [None]
    if mode == "csr":
        from okapi_spark.operators.pagerank import _EPOCH_COUNTER
        from okapi_spark.plans.csr_blocks import (
            choose_task_count, default_block_dir, stage_blocks,
        )

        epoch = next(_EPOCH_COUNTER)
        k_tasks = choose_task_count(total_edges, num_partitions)
        edges_by_pid = (
            g.edges.select("src", "dst", "weight")
            .withColumn("pid", F.pmod(F.xxhash64("dst"), F.lit(num_partitions)).cast("int"))
            .repartition(num_partitions, "pid")
        )

        def ensure_staged() -> str:
            if block_slot[0] is None:
                block_slot[0] = default_block_dir(spark)
                with no_adaptive(spark):
                    staged = stage_blocks(
                        edges_by_pid, num_partitions, _lpa_pack, "spin", epoch, block_slot[0]
                    )
                assert staged == total_edges, (
                    f"staged {staged} edge rows != |E|={total_edges}"
                )
            return block_slot[0]

        def hist_fn(st: DataFrame) -> DataFrame:
            return _csr_label_hist(
                spark, num_partitions, k_tasks, epoch, ensure_staged(),
                st.select("id", F.col("part").cast("long").alias("lbl")),
                lbl_slot, n_rows=n,
            )

        def active_fn(moved: DataFrame, n_moved: int) -> DataFrame:
            return _csr_active_dsts(
                spark, num_partitions, k_tasks, epoch, ensure_staged(),
                moved, mv_slot, n_rows=n_moved,
            )

        csr_fns = (hist_fn, active_fn)

    # --- init + optional prior + repartition adaptation -------------------
    rand_part = F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(k)).cast("int")
    if prior is not None:
        state = vertices.join(
            prior.select("id", F.col("part").cast("int").alias("prior_part")), "id", "left"
        ).select("id", "deg", "wdeg", F.coalesce("prior_part", rand_part).alias("part"))
    else:
        state = vertices.select("id", "deg", "wdeg", rand_part.alias("part"))
    if repartition < 0:
        state = state.select(
            "id", "deg", "wdeg",
            F.when(
                F.col("part") >= k_total,
                F.pmod(F.xxhash64("id", F.lit("down"), F.lit(seed)), F.lit(k_total)).cast("int"),
            ).otherwise(F.col("part")).alias("part"),
        )
    elif repartition > 0:
        u0 = F.pmod(F.xxhash64("id", F.lit("up"), F.lit(seed)), F.lit(10**9)).cast("double") / 1e9
        state = state.select(
            "id", "deg", "wdeg",
            F.when(
                u0 < F.lit(repartition / k_total),
                (F.lit(k) + F.pmod(F.xxhash64("id", F.lit("new"), F.lit(seed)), F.lit(repartition))).cast("int"),
            ).otherwise(F.col("part")).alias("part"),
        )
    state = state.localCheckpoint(eager=True)

    def _ceil3(x: float) -> float:
        import math
        return math.ceil(x * 1000.0) / 1000.0

    # loads in edge counts (persistent LOAD aggregators, :352-366);
    # computed once here, then carried forward from each round's fused
    # migration-stats job (3 Spark jobs per round total, not 6)
    loads = {
        int(r.part): float(r.load)
        for r in state.groupBy("part").agg(F.sum("deg").alias("load")).collect()
    }

    from contextlib import ExitStack, nullcontext

    try:
        with ExitStack() as loop_ctx:
            loop_ctx.enter_context(
                no_adaptive(spark) if (state_broadcast or mode == "csr") else nullcontext()
            )
            state, rounds, converged, log = _spinner_loop(
                spark, state, edges, _maybe_bcast, loads, capacity, lam, k_total,
                max_iterations, threshold, window, seed, total_edges, _ceil3,
                csr_fns=csr_fns,
            )
    finally:
        if block_slot[0] is not None:
            from okapi_spark.plans.csr_blocks import cleanup_blocks

            cleanup_blocks(block_slot[0])
    for slot in (lbl_slot, mv_slot):
        if slot[0] is not None:
            slot[0].destroy()
            slot[0] = None
    return BSPResult(state.select("id", "part"), rounds, converged, log)


def _spinner_loop(
    spark, state, edges, _maybe_bcast, loads, capacity, lam, k_total,
    max_iterations, threshold, window, seed, total_edges, _ceil3,
    csr_fns=None,
):
    score_window: list[float] = []
    log: list[dict] = []
    moved_prev: DataFrame | None = None  # frontier: who migrated last round
    n_moved_prev = 0
    total_migrations = 0
    converged = False
    rounds = 0

    for rnd in range(max_iterations):
        _round_t0 = time.time()
        rounds = rnd + 1
        pf = {p: lam * _ceil3(loads.get(p, 0.0) / capacity) for p in range(k_total)}
        pf_expr = F.create_map(*[x for p in range(k_total) for x in (F.lit(p), F.lit(pf[p]))])
        # constant best-absent-label candidate: max over l of λ − PF(l)
        l_star = min(range(k_total), key=lambda p: (pf[p], p))
        h_star = lam - pf[l_star]

        # --- ComputeNewPartition (:292-313) -------------------------------
        if csr_fns is not None:
            hist = csr_fns[0](state).persist(StorageLevel.MEMORY_AND_DISK)
        else:
            labels = state.select(F.col("id").alias("src"), F.col("part").alias("spart"))
            hist = (
                edges.join(_maybe_bcast(labels), "src")
                .groupBy(F.col("dst").alias("id"), F.col("spart").alias("cand"))
                .agg(F.sum("weight").alias("w"))
            ).persist(StorageLevel.MEMORY_AND_DISK)

        # normalize by the vertex's total label weight Σw (:264-268);
        # carry w so the local-edge counter (:186-204) folds into the
        # fused per-round stats job below
        scored = (
            hist.join(state.select("id", "wdeg", "part"), "id")
            .select(
                "id", "cand", "part", "w",
                (F.lit(lam) + F.col("w") / F.col("wdeg") - pf_expr[F.col("cand")]).alias("h"),
            )
        )
        star = state.select(
            "id", F.lit(l_star).alias("cand"), "part", F.lit(0.0).alias("w"), F.lit(h_star).alias("h")
        )
        allc = scored.unionByName(star)
        # H and freq-weight at the current partition (currentState
        # aggregator :284 + locals counter)
        cur_stats = (
            allc.filter(F.col("cand") == F.col("part"))
            .groupBy("id")
            .agg(F.max("h").alias("h_cur"), F.max("w").alias("w_cur"))
        )
        best = (
            allc.groupBy("id")
            .agg(F.max(F.struct(F.col("h"), (-F.col("cand")).alias("neg"))).alias("m"))
            .select("id", (-F.col("m.neg")).cast("int").alias("best_cand"), F.col("m.h").alias("h_best"))
        )
        decided = (
            state.join(best, "id", "left")
            .join(cur_stats, "id", "left")
            .select(
                "id", "deg", "wdeg", "part",
                F.coalesce("w_cur", F.lit(0.0)).alias("w_cur"),
                F.coalesce(
                    "h_cur",
                    F.lit(lam) - pf_expr[F.col("part")],  # freq 0 at current
                ).alias("h_now"),
                # prefer current on ties (chooseMinLabelPartition :226-240)
                F.when(
                    F.col("h_best") > F.coalesce("h_cur", F.lit(lam) - pf_expr[F.col("part")]),
                    F.col("best_cand"),
                ).otherwise(F.col("part")).alias("want"),
            )
        )
        # isActive gating (:295-313): only vertices with a migrated
        # neighbor request migration (round 0: everyone, Initializer
        # messages all edges :425-466)
        if moved_prev is not None:
            if csr_fns is not None:
                active = csr_fns[1](moved_prev, n_moved_prev)
            else:
                active = (
                    edges.join(_maybe_bcast(moved_prev.select(F.col("id").alias("src"))), "src")
                    .select(F.col("dst").alias("id"))
                    .distinct()
                )
            decided = decided.join(active.withColumn("act", F.lit(True)), "id", "left").select(
                "id", "deg", "wdeg", "part", "w_cur", "h_now",
                F.when(F.col("act").isNotNull(), F.col("want")).otherwise(F.col("part")).alias("want"),
            )
        decided = decided.persist(StorageLevel.MEMORY_AND_DISK)

        # fused stats: score (Σ h_now), local edges (Σ w_cur) and
        # per-target demand (Σ deg of movers) in ONE job — grouped by
        # the migration target, null group = stayers
        stats_rows = (
            decided.groupBy(
                F.when(F.col("want") != F.col("part"), F.col("want")).alias("tgt")
            )
            .agg(
                F.sum("h_now").alias("sh"),
                F.sum("w_cur").alias("sw"),
                F.sum("deg").alias("sd"),
            )
            .collect()
        )
        score = float(sum((r.sh or 0.0) for r in stats_rows))
        local_edges = float(sum((r.sw or 0.0) for r in stats_rows))
        demand = {int(r.tgt): float(r.sd) for r in stats_rows if r.tgt is not None}

        # --- convergence check BEFORE migrating (:700-736) -----------------
        if len(score_window) >= window and rnd > window:
            best_prev = max(score_window[-window:])
            if best_prev != 0 and abs(1.0 - score / best_prev) < threshold:
                converged = True
        score_window.append(score)
        if converged:
            hist.unpersist()
            state = decided.select("id", "deg", "wdeg", "part").localCheckpoint(eager=True)
            decided.unpersist()
            log.append({
                "superstep": rnd, "score": score, "migrations": 0,
                "local_edges_pct": 100.0 * local_edges / max(total_edges, 1),
                "loads": loads, "_halted": True,
                "superstep_sec": time.time() - _round_t0,
            })
            break

        # --- ComputeMigration (:343-418) -----------------------------------
        probs = {}
        for p in range(k_total):
            remaining = capacity - loads.get(p, 0.0)
            d = demand.get(p, 0.0)
            probs[p] = 0.0 if (d == 0 or remaining <= 0) else remaining / d
        prob_expr = F.create_map(*[x for p in range(k_total) for x in (F.lit(p), F.lit(probs[p]))])
        u = F.pmod(F.xxhash64("id", F.lit(rnd), F.lit(seed)), F.lit(10**9)).cast("double") / 1e9
        migrated = decided.select(
            "id", "deg", "wdeg",
            F.when(
                (F.col("want") != F.col("part")) & (u < prob_expr[F.col("want")]),
                F.col("want"),
            ).otherwise(F.col("part")).alias("part"),
            F.col("part").alias("old_part"),
        ).localCheckpoint(eager=True)
        # fused migration stats: next round's loads AND the migration
        # counter from one scan of the (cached) migrated state
        mig_rows = (
            migrated.groupBy("part")
            .agg(
                F.sum("deg").alias("load"),
                F.sum(F.when(F.col("part") != F.col("old_part"), 1).otherwise(0)).alias("mig"),
            )
            .collect()
        )
        next_loads = {int(r.part): float(r.load) for r in mig_rows}
        n_migrations = int(sum(r.mig for r in mig_rows))
        total_migrations += n_migrations
        moved_prev = migrated.filter(F.col("part") != F.col("old_part")).select("id")
        n_moved_prev = n_migrations

        hist.unpersist()
        decided.unpersist()
        state = migrated.select("id", "deg", "wdeg", "part")

        load_vals = [loads.get(p, 0.0) for p in range(k_total)]
        expected = total_edges / k_total
        log.append({
            "superstep": rnd,
            "score": score,
            "migrations": n_migrations,
            "total_migrations": total_migrations,
            "local_edges_pct": 100.0 * local_edges / max(total_edges, 1),
            "maxmin_unbalance": (max(load_vals) / min(load_vals)) if min(load_vals) > 0 else float("inf"),
            "max_norm_load": max(load_vals) / expected if expected else 0.0,
            "loads": loads,  # this round's pre-migration loads
            "_halted": False,
            "superstep_sec": time.time() - _round_t0,
        })
        loads = next_loads

    return state, rounds, converged, log
