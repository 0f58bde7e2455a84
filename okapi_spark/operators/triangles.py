"""Triangle counting & enumeration — graphs/Triangles.java:35-371.

The reference runs 4 message-passing supersteps (PropagateId to
higher-id neighbors → ForwardId → CloseTrianglesAndCount), counting
each unique triangle once at its MAXIMUM-id vertex (:131-151).

Spark-first this is not iterative at all: orient each undirected edge
toward its higher-DEGREE endpoint (ties by id) — the node-iterator++
total order — self-join on the pivot to build wedges, and left-semi
join the closing pair against the oriented edge set — two shuffles
total, whole-stage codegen'd joins, no Python. Exact by construction:
each triangle is enumerated exactly once at its lowest-ordered vertex
(replacing the reference's id-ordering message discipline, :76-83,
:100-110); output rows are re-sorted to (low, mid, high) BY ID so
downstream per-vertex placement semantics (max-id vertex) are
unchanged.

Why degree order and not id order: the wedge count is Σ_v C(out(v),2)
and degree-orientation minimizes it (out(v) ≤ O(√E) for any graph;
hubs get out ≈ 0 because all their edges point INTO them). With id
order a power-law hub that happens to have a small id keeps its whole
edge list outgoing — measured on 60M Zipf edges: the id-ordered plan
shuffles ~10⁹ wedge rows into the semi-join and goes disk-bound (flat
305s wall at BOTH 8 and 32 cores); the degree-ordered plan's wedge set
is orders of magnitude smaller (BENCH.md round-3).

For extreme cases the ``chunks`` knob (ScalableSemimetric.java:67-113
megastep precedent) processes pivot-vertex slices in passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from okapi_spark.graph.graph import Graph

# One-shot plans pay the serial driver-side broadcast-relation build
# against only TWO join uses (vs hundreds for per-superstep state
# broadcasts), so their economic budget is far below the 256MB
# iterative default — 64MB (≈2M vertices) per the measured A/B in
# BENCH.md "Triangle orientation broadcast A/B".
ONE_SHOT_BROADCAST_BUDGET_BYTES = 64 * 1024 * 1024

# The ARRAY orientation path broadcasts two packed int64 numpy arrays
# (sorted ids + degrees, 16B/vertex) via sc.broadcast's torrent
# transport instead of a BroadcastHashJoin relation: no driver-side
# hash-relation build (the serial floor the A/B measured at |V|=6M),
# ~2x smaller payload, and the lookup is a vectorized searchsorted in
# mapInArrow. That cheaper floor buys it a 4x wider budget: 256MB ≈
# 16M vertices. Past this, the shuffle_hash fallback remains the
# cluster-scale plan (nothing |V|-sized ships anywhere).
ONE_SHOT_ARRAY_BUDGET_BYTES = 256 * 1024 * 1024


def _canonical(graph: Graph) -> DataFrame:
    """Undirected canonical edge set: one row per unordered pair {u,v}.

    For a ``symmetric_distinct`` graph (induced/symmetrized edge sets)
    this is the free filter ``src < dst`` — no distinct shuffle of the
    edge table; otherwise fall back to least/greatest + distinct."""
    if graph.symmetric_distinct:
        return graph.edges.filter(F.col("src") < F.col("dst")).select(
            F.col("src").alias("u"), F.col("dst").alias("v")
        )
    return (
        graph.edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .distinct()
    )


class _BroadcastHandle:
    """Adapter so a ``sc.broadcast`` rides the oriented-plan extras
    list (whose members are released via ``unpersist()``)."""

    def __init__(self, b):
        self._b = b

    def unpersist(self) -> None:
        self._b.destroy()


def _oriented(
    graph: Graph, deg_broadcast: bool | str | None = None
) -> tuple[DataFrame, list]:
    """Degree-ordered orientation of the canonical edge set: one row
    per unordered pair {a, b}, directed (u → v) with (deg(u), u) <
    (deg(v), v), carrying deg(v) for downstream ordering of wedge
    endpoints. Degree = undirected neighbor count.

    Returns ``(oriented, [deg_handle])`` — the degree table is
    persisted (it feeds both join legs and the broadcast gate's count)
    and must be released by the caller once the oriented set is
    materialized.

    The two degree lookups are BROADCAST joins when the |V|-row table
    fits the ONE-SHOT byte budget (64MB ≈ 2M vertices at 32B/row) —
    orientation then adds ZERO |E|-row exchanges on top of the one
    map-side-combined degree groupBy, and Spark's ReuseExchange dedupes
    the two builds into one (structurally asserted in test_plans.py).

    The one-shot budget is deliberately 4× tighter than the iterative
    operators' 256MB state-broadcast budget, and it is MEASURED, not
    assumed (BENCH.md "Triangle orientation broadcast A/B"): a
    per-superstep broadcast amortizes its serial driver-side relation
    build over many rounds, but this plan uses it exactly twice — at
    |V| = 6M (192MB relation, 60M-edge run) the build made orientation
    ~2× SLOWER than the shuffle path on both 2 and 8 executor JVMs,
    while at gate/bench shapes (|V| ≤ 240k) the broadcast wins
    outright. Past the budget the shuffle_hash fallback builds on the
    degree side and streams the edges (SMJ would sort the edge set
    twice); it re-exchanges the edge set once per endpoint — the
    provable minimum for annotating both endpoint degrees without a
    broadcast — and is pinned at the chassis raw-shuffle ceiling in
    the scaling decomposition (0.31-0.36 vs control 0.343). Callers
    with edge-exchange-dominated shapes (|E|/|V| ≫ 12, where the
    measured crossover sits) can force ``deg_broadcast=True``.

    Between the two budgets sits the ARRAY mode
    (``deg_broadcast="array"``, auto-gated at 16B/vertex vs 256MB):
    a packed numpy degree array through ``sc.broadcast`` + vectorized
    ``searchsorted`` in ``mapInArrow`` — still zero edge exchanges but
    without the driver-side hash-relation build that made the
    relation broadcast lose at |V| = 6M (see ``_oriented_array``)."""
    from pyspark.storagelevel import StorageLevel

    from okapi_spark.plans.broadcast import auto_state_broadcast

    e = _canonical(graph)
    if graph.symmetric_distinct:
        # both directions present exactly once ⇒ out-degree == degree,
        # no canonical-set union needed
        deg = graph.edges.groupBy(F.col("src").alias("x")).agg(F.count("*").alias("d"))
    else:
        deg = (
            e.select(F.col("u").alias("x"))
            .unionAll(e.select(F.col("v").alias("x")))
            .groupBy("x")
            .agg(F.count("*").alias("d"))
        )
    # persist: the |V|-row table feeds both join legs (and the gate's
    # count action) — one edge-set pass instead of one per leg
    deg = deg.persist(StorageLevel.MEMORY_AND_DISK)
    if deg_broadcast is None:
        n = deg.count()
        if auto_state_broadcast(n, row_bytes=32, budget_bytes=ONE_SHOT_BROADCAST_BUDGET_BYTES):
            deg_broadcast = True
        elif auto_state_broadcast(n, row_bytes=16, budget_bytes=ONE_SHOT_ARRAY_BUDGET_BYTES):
            deg_broadcast = "array"
        else:
            deg_broadcast = False
    if deg_broadcast == "array":
        return _oriented_array(graph, e, deg)
    du = deg.select(F.col("x").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("x").alias("v"), F.col("d").alias("dv"))
    if deg_broadcast:
        j = e.join(F.broadcast(du), "u").join(F.broadcast(dv), "v")
    else:
        j = e.join(du.hint("shuffle_hash"), "u").join(dv.hint("shuffle_hash"), "v")
    flip = F.struct(F.col("dv"), F.col("v")) < F.struct(F.col("du"), F.col("u"))
    oriented = j.select(
        F.when(flip, F.col("v")).otherwise(F.col("u")).alias("u"),
        F.when(flip, F.col("u")).otherwise(F.col("v")).alias("v"),
        F.when(flip, F.col("du")).otherwise(F.col("dv")).alias("dv"),
    )
    return oriented, [deg]


def _oriented_array(graph: Graph, e: DataFrame, deg: DataFrame) -> tuple[DataFrame, list]:
    """Zero-exchange orientation via a packed-array degree broadcast.

    The |V|-row degree table is gathered executor-side into two sorted
    int64 numpy arrays (ids, degrees — the same ``mapInArrow`` pack
    PageRank's csr gather uses, pagerank.py:_gather_sorted_arrays) and
    shipped once through ``sc.broadcast`` torrent transport. The
    orientation itself is then a map: each Arrow batch of canonical
    (u, v) rows looks both degrees up with a vectorized
    ``np.searchsorted`` and emits the flipped row — no edge exchange,
    no driver-side hash-relation build (the two serial floors the
    measured A/B attributed the broadcast plan's 2x absolute loss to at
    |V|=6M, BENCH.md "Triangle orientation broadcast A/B").

    Total order is identical to the join paths: (deg, id) ascending,
    so the three modes produce the same oriented set (equivalence
    pytest)."""
    import numpy as np
    import pyarrow as pa

    from okapi_spark.operators.pagerank import _gather_sorted_arrays

    ids, (degs,) = _gather_sorted_arrays(
        deg.select(F.col("x").alias("id"), "d"), deg.count(), [("d", "int64")]
    )
    sc = graph.edges.sparkSession.sparkContext
    b = sc.broadcast((ids, degs))

    def orient(batches):
        bids, bdegs = b.value
        for batch in batches:
            u = batch.column("u").to_numpy(zero_copy_only=False)
            v = batch.column("v").to_numpy(zero_copy_only=False)
            du = bdegs[np.searchsorted(bids, u)]
            dv = bdegs[np.searchsorted(bids, v)]
            flip = (dv < du) | ((dv == du) & (v < u))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.where(flip, v, u)),
                    pa.array(np.where(flip, u, v)),
                    pa.array(np.where(flip, du, dv)),
                ],
                names=["u", "v", "dv"],
            )

    oriented = e.mapInArrow(orient, "u long, v long, dv long")
    return oriented, [deg, _BroadcastHandle(b)]


def triangles_df(graph: Graph, chunks: int = 1) -> DataFrame:
    """All triangles as rows (low, mid, high), low < mid < high (by id).

    The oriented edge set backing the returned plan stays cached for
    the session (it feeds every downstream action on the plan);
    consume-once callers should prefer the count wrappers below, which
    release it after their action."""
    tri, _o = _triangles_plan(graph, chunks)
    return tri


class _OrientedHandle:
    """Persisted-state handle for a triangle plan: the oriented edge
    set plus the degree table backing it. ``count()`` materializes the
    oriented set (phase-1 boundary for the scaling bench);
    ``unpersist()`` releases everything."""

    def __init__(self, oriented: DataFrame, extras: list[DataFrame]):
        self._o = oriented
        self._extras = extras

    def count(self) -> int:
        return self._o.count()

    def unpersist(self) -> None:
        self._o.unpersist()
        for df in self._extras:
            df.unpersist()


def _triangles_plan(graph: Graph, chunks: int = 1) -> tuple[DataFrame, _OrientedHandle]:
    """(triangles, oriented_handle) — the handle owns the persisted
    oriented edge set (+ degree table); callers that fully consume the
    triangle plan in one action must unpersist it afterwards."""
    from pyspark.storagelevel import StorageLevel

    # the oriented set feeds THREE plan legs (both wedge sides + the
    # closing semi-join); uncached it is recomputed per leg — its
    # canonical-distinct + degree joins dominated the whole job
    # (measured 65s of a 238s run, ×3) — so materialize it once
    o_df, extras = _oriented(graph)
    o = o_df.persist(StorageLevel.MEMORY_AND_DISK)
    wedges_parts = []
    for c in range(chunks):
        e1 = o.alias("e1")
        if chunks > 1:
            e1 = e1.filter(F.pmod(F.xxhash64(F.col("u")), F.lit(chunks)) == c)
        # unordered out-pair {b, c} of pivot a, taken once via the same
        # (deg, id) total order the orientation uses — so the closing
        # pair (e1.v → e2.v) is already in oriented form
        # shuffle_hash: hash-build one |E|-row side, stream the other —
        # SMJ would SORT the wedge output's inputs; with degree capping
        # the per-key groups are tiny, so the hash probe is cheap
        w = e1.join(
            o.alias("e2").hint("shuffle_hash"),
            (F.col("e1.u") == F.col("e2.u"))
            & (
                F.struct(F.col("e1.dv"), F.col("e1.v"))
                < F.struct(F.col("e2.dv"), F.col("e2.v"))
            ),
            "inner",
        ).select(
            F.col("e1.u").alias("a"),
            F.col("e1.v").alias("b"),
            F.col("e2.v").alias("c"),
        )
        wedges_parts.append(w)
    wedges = wedges_parts[0]
    for w in wedges_parts[1:]:
        wedges = wedges.unionByName(w)
    # hash-build on the |E|-row closing side and STREAM the (much
    # larger) wedge set — never sort the wedges
    closing = o.select(F.col("u").alias("b"), F.col("v").alias("c")).hint("shuffle_hash")
    tri = wedges.join(closing, ["b", "c"], "left_semi")
    ids = F.array_sort(F.array("a", "b", "c"))
    tri = tri.select(
        ids[0].alias("low"), ids[1].alias("mid"), ids[2].alias("high")
    )
    return tri, _OrientedHandle(o, extras)


def triangle_count(
    graph: Graph,
    chunks: int = 1,
    mode: str = "sql",
    num_partitions: int | None = None,
    block_dir: str | None = None,
) -> int:
    """Total unique triangles.

    ``mode="sql"`` (default): the two-join wedge plan above.
    ``mode="csr"``: resident staged-block kernel (see
    ``_triangle_count_csr``) — same count, zero wedge shuffle."""
    if mode == "csr":
        n, _phases = _triangle_count_csr(
            graph, num_partitions=num_partitions, block_dir=block_dir
        )
        return n
    tri, o = _triangles_plan(graph, chunks)
    try:
        return tri.count()
    finally:
        o.unpersist()


# ---------------------------------------------------------------------------
# mode="csr": resident staged-block triangle counting
# ---------------------------------------------------------------------------
#
# The sql plan's scale cost is the WEDGE EXCHANGE: the Σ C(out(v),2)
# wedge rows (≈ |E|·avg_outdeg — 600M rows / ~14GB at the 60M-edge
# scaling shape) are shuffled into the closing semi-join's hash probe.
# The csr mode never materializes a wedge row in Spark at all. One
# staging pass partitions the degree-ordered oriented set by pivot
# (pid = u % P — u is dense non-negative here, see the id envelope
# below) and packs each partition as a memmapped block
# (plans/csr_blocks.py — the OS page cache is the shared per-node
# block cache) holding BOTH faces of the same edges:
#
#   * indptr/nbr: per-pivot out-neighbor CSR, neighbors sorted by the
#     orientation's (deg, id) total order — so wedge pair (i < j) of
#     a segment is ALREADY the oriented closing edge (n_i → n_j); and
#   * mkeys: the block's edges as a sorted int64 key array
#     key = u·M + v (M = max_id + 1) — the membership index, routed
#     from a probe key by (key // M) % P with no second exchange.
#
# The orientation itself is never materialized: |E|, max/min id come
# from the |V|-row degree table (Σdeg = 2·|E_canonical|), so the
# staging exchange is the oriented set's ONLY consumer and the
# canonicalize → degree-annotate → orient maps FUSE into its map
# side — one |E|-scale exchange total. The count is then ONE
# zero-exchange P-row ``mapInPandas`` job: each task enumerates its
# pivot segments' out-pairs in vectorized NumPy (degree-bucketed
# repeat/gather; hub pivots fall back to tail slices so no O(d²)
# index table is built for d ≈ √E) and membership-probes the closing
# keys with ``np.searchsorted`` into the blocks' mkeys — wedges
# live only in registers/L2, nothing |wedges|-sized is ever exchanged,
# written, or even held in memory (bounded ``_PROBE_CHUNK`` slabs).
#
# Deployment envelope (documented, gated): every node must be able to
# page-cache the |E|·8B membership keys (60M edges = 480MB; 10⁹ edges
# = 8GB — the classic per-node-adjacency regime), and ids must pack a
# pair into int64: (max_id+1)² < 2⁶³, else they are densified to
# [0, |V|) via a sorted-id broadcast + searchsorted remap (gated at
# the 256MB budget ≈ 32M vertices — strictly inside the membership
# envelope). Past either limit the sql plan remains the cluster-scale
# path, exactly like the other operators' csr/sql mode splits.

# probe slab size: bounds kernel working memory at ~3·8B·4M ≈ 100MB
# per task while keeping each searchsorted call long enough to
# amortize its setup
_PROBE_CHUNK = 4_000_000
# degree-bucket vectorized path cap: C(d,2) index tables above ~4M
# pairs would cost O(d²) memory per bucket; hubs (d up to O(√E) under
# degree orientation) take the per-(segment, i) tail-slice path whose
# python-loop count is Σ_hub d_hub ≪ wedge count
_PAIR_BUCKET_CAP = 1 << 22


def _tri_wedge_pack(pdf, M: int):
    """Per-partition pivot block (runs once inside ``stage_blocks``),
    both faces of the partition's edges: out-neighbor CSR with
    neighbors sorted by the orientation's (deg(v), v) total order —
    so in-segment pair (i < j) IS the oriented closing edge
    (n_i → n_j) — and the sorted u·M+v membership keys ``mkeys``
    (sorting the combined key = sorting by (u, v))."""
    import numpy as np

    u = pdf["u"].to_numpy(np.int64)
    v = pdf["v"].to_numpy(np.int64)
    dv = pdf["dv"].to_numpy(np.int64)
    mkeys = np.sort(u * M + v)
    order = np.lexsort((v, dv, u))  # primary u, then dv, then v
    u, v = u[order], v[order]
    _, start = np.unique(u, return_index=True)
    indptr = np.append(start, u.size).astype(np.int64)
    return {"indptr": indptr, "nbr": v, "mkeys": mkeys}


def _probe_membership(keys, M: int, P: int, epoch: int, block_dir: str) -> int:
    """How many of ``keys`` exist in the oriented edge set: route each
    key to the pivot block (key // M) % P, binary-search that block's
    sorted ``mkeys``. Every task may open every block — the memmap
    pages are shared node-wide through the OS page cache."""
    import numpy as np

    from okapi_spark.plans.csr_blocks import load_block

    hits = 0
    blkid = (keys // M) % P
    for p in np.unique(blkid):
        mblk = load_block("triw", epoch, int(p), block_dir)
        if mblk is None:
            continue
        karr = mblk["mkeys"]
        probes = keys[blkid == p]
        pos = np.searchsorted(karr, probes)
        ok = pos < karr.size
        if ok.any():
            hits += int(np.count_nonzero(np.asarray(karr[pos[ok]]) == probes[ok]))
    return hits


def _count_wedge_block(indptr, nbr, M: int, P: int, epoch: int, block_dir: str) -> int:
    """Closed-wedge count of one pivot block: enumerate out-pairs per
    segment (degree-bucketed vectorized gather; hub tail-slices past
    ``_PAIR_BUCKET_CAP``), buffer closing keys into ``_PROBE_CHUNK``
    slabs, membership-probe each slab."""
    import numpy as np

    indptr = np.asarray(indptr)
    nbr = np.asarray(nbr)
    deg = np.diff(indptr)
    starts = indptr[:-1]
    state = {"buf": [], "buffered": 0, "hits": 0}

    def flush():
        if not state["buf"]:
            return
        keys = (
            np.concatenate(state["buf"]) if len(state["buf"]) > 1 else state["buf"][0]
        )
        state["buf"], state["buffered"] = [], 0
        state["hits"] += _probe_membership(keys, M, P, epoch, block_dir)

    def push(keys):
        state["buf"].append(keys)
        state["buffered"] += keys.size
        if state["buffered"] >= _PROBE_CHUNK:
            flush()

    for d in np.unique(deg).tolist():
        d = int(d)
        if d < 2:
            continue
        segs = starts[deg == d]
        npairs = d * (d - 1) // 2
        if npairs <= _PAIR_BUCKET_CAP:
            i_idx, j_idx = np.triu_indices(d, k=1)
            step = max(1, _PROBE_CHUNK // npairs)
            for s0 in range(0, segs.size, step):
                ss = segs[s0 : s0 + step, None]
                b = nbr[ss + i_idx[None, :]].ravel().astype(np.int64)
                c = nbr[ss + j_idx[None, :]].ravel().astype(np.int64)
                push(b * M + c)
        else:
            for s in segs.tolist():
                seg = np.asarray(nbr[s : s + d], dtype=np.int64)
                for i in range(d - 1):
                    push(seg[i] * M + seg[i + 1 :])
    flush()
    return state["hits"]


def _tri_csr_kernel(M: int, P: int, epoch: int, block_dir: str):
    def kernel(pdfs):
        import pandas as pd

        from okapi_spark.plans.csr_blocks import load_block

        total = 0
        for pdf in pdfs:
            for pid in pdf["pid"].tolist():
                blk = load_block("triw", epoch, int(pid), block_dir)
                if blk is None:
                    continue
                total += _count_wedge_block(
                    blk["indptr"], blk["nbr"], M, P, epoch, block_dir
                )
        yield pd.DataFrame({"n": [total]})

    return kernel


def _triangle_count_csr(
    graph: Graph,
    num_partitions: int | None = None,
    block_dir: str | None = None,
) -> tuple[int, dict]:
    """(count, phase_timings) — see the mode="csr" block comment."""
    import time

    from okapi_spark.bsp import no_adaptive
    from okapi_spark.operators.pagerank import _EPOCH_COUNTER
    from okapi_spark.plans.csr_blocks import (
        choose_task_count,
        cleanup_blocks,
        default_block_dir,
        pid_frame,
        stage_blocks,
    )

    import functools

    spark = graph.edges.sparkSession
    P = num_partitions or spark.sparkContext.defaultParallelism
    epoch = next(_EPOCH_COUNTER)
    own_dir = block_dir is None

    t0 = time.time()
    o = None
    extras: list = []
    bmap = None
    try:
        o, extras = _oriented(graph)
        # |E|, id range, |V| all come from the |V|-row degree table
        # (Σdeg counts each canonical edge at both endpoints), so the
        # oriented set itself is consumed exactly ONCE — by the
        # staging exchange below — and its canonicalize → degree →
        # orient maps fuse into that exchange's map side; nothing
        # |E|-sized is persisted or scanned twice.
        deg = extras[0]
        row = deg.agg(F.sum("d"), F.max("x"), F.min("x"), F.count("*")).collect()[0]
        if row[0] is None:
            return 0, {"deg_sec": round(time.time() - t0, 2),
                       "stage_sec": 0.0, "probe_sec": 0.0}
        sum_d, mx, mn, nv = int(row[0]), int(row[1]), int(row[2]), int(row[3])
        assert sum_d % 2 == 0, f"degree sum {sum_d} is odd"
        m = sum_d // 2
        M = mx + 1
        if mn < 0 or M * M - 1 >= (1 << 63):
            # hashed/sparse ids (e.g. induce_edges' xxhash64-derived
            # vertex ids span the full signed-64 range): densify to
            # [0, |V|) with a sorted-id broadcast + vectorized
            # searchsorted — the same packed-array transport the
            # orientation uses, fused into the same staging scan.
            # |V|·8B must clear the broadcast budget (32M vertices at
            # the 256MB default), strictly smaller than the mode's
            # per-node |E|·8B membership envelope; past it, sql
            # remains the cluster-scale plan.
            from okapi_spark.operators.pagerank import _gather_sorted_arrays
            from okapi_spark.plans.broadcast import auto_state_broadcast

            if not auto_state_broadcast(nv, row_bytes=8):
                raise ValueError(
                    f"mode='csr' packs edge {{u,v}} into an int64 key "
                    f"u*(max_id+1)+v; id range [{mn}, {mx}] does not fit and "
                    f"|V|={nv} exceeds the densify-remap broadcast budget — "
                    "remap ids to a dense non-negative range first, or use "
                    "mode='sql'."
                )
            ids_arr, _unused = _gather_sorted_arrays(
                deg.select(F.col("x").alias("id"), "d"), nv, [("d", "int64")]
            )
            bmap = spark.sparkContext.broadcast(ids_arr)

            def _remap(batches):
                import numpy as np
                import pyarrow as pa

                sids = bmap.value
                for batch in batches:
                    u = batch.column("u").to_numpy(zero_copy_only=False)
                    v = batch.column("v").to_numpy(zero_copy_only=False)
                    dv = batch.column("dv").to_numpy(zero_copy_only=False)
                    yield pa.RecordBatch.from_arrays(
                        [
                            pa.array(np.searchsorted(sids, u)),
                            pa.array(np.searchsorted(sids, v)),
                            pa.array(dv),
                        ],
                        names=["u", "v", "dv"],
                    )

            o = o.mapInArrow(_remap, "u long, v long, dv long")
            M = int(nv)
        t1 = time.time()
        if own_dir:
            block_dir = default_block_dir(spark)
        try:
            with no_adaptive(spark):
                w = o.withColumn(
                    "pid", F.pmod(F.col("u"), F.lit(P)).cast("int")
                ).repartition(P, "pid")
                staged = stage_blocks(
                    w, P, functools.partial(_tri_wedge_pack, M=M),
                    "triw", epoch, block_dir,
                )
            assert staged == m, f"staged {staged} rows != oriented |E|={m}"
            # degree table (and any orientation broadcast) fed only the
            # staging scan — release before the probe job
            for df in extras:
                df.unpersist()
            extras = []
            t2 = time.time()
            k_tasks = choose_task_count(m, P)
            total = (
                pid_frame(spark, P, k_tasks)
                .mapInPandas(_tri_csr_kernel(M, P, epoch, block_dir), "n long")
                .agg(F.sum("n"))
                .collect()[0][0]
            )
            t3 = time.time()
        finally:
            if own_dir:
                cleanup_blocks(block_dir)
            if bmap is not None:
                bmap.destroy()
        return int(total or 0), {
            "deg_sec": round(t1 - t0, 2),
            "stage_sec": round(t2 - t1, 2),
            "probe_sec": round(t3 - t2, 2),
        }
    finally:
        for df in extras:
            df.unpersist()


def triangle_count_per_vertex(graph: Graph, chunks: int = 1) -> DataFrame:
    """(id, triangles) — count placed at the max-id vertex of each
    triangle, matching TriangleCount output (Triangles.java:131-151;
    null-valued vertices dropped per TriangleOutputFormat :323-370).
    The aggregate is materialized (localCheckpoint) so the oriented
    edge cache can be released before returning."""
    tri, o = _triangles_plan(graph, chunks)
    out = (
        tri.groupBy(F.col("high").alias("id"))
        .agg(F.count("*").alias("triangles"))
        .localCheckpoint(eager=True)
    )
    o.unpersist()
    return out


def triangles_per_vertex_all(graph: Graph) -> DataFrame:
    """(id, triangles) counting each triangle at ALL three corners —
    the building block for clustering coefficient
    (graphs/ClusteringCoefficient.java:89-192). Materialized, so the
    oriented edge cache is released before returning."""
    t, o = _triangles_plan(graph)
    stacked = (
        t.select(F.col("low").alias("id"))
        .unionAll(t.select(F.col("mid").alias("id")))
        .unionAll(t.select(F.col("high").alias("id")))
    )
    out = stacked.groupBy("id").agg(F.count("*").alias("triangles")).localCheckpoint(eager=True)
    o.unpersist()
    return out
