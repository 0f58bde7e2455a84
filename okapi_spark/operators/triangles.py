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


def triangle_count(graph: Graph, chunks: int = 1) -> int:
    """Total unique triangles."""
    tri, o = _triangles_plan(graph, chunks)
    try:
        return tri.count()
    finally:
        o.unpersist()


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
