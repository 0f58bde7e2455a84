"""Structural plan assertions — the performance contract as tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from okapi_spark.graph.graph import Graph
from okapi_spark.plans.inspect import count_broadcast_joins, count_exchanges
from okapi_spark.sources.synth_graph import generate_edges


def test_superstep_message_plan_zero_exchange(spark):
    """In broadcast-state mode the per-superstep message aggregation
    must contain zero shuffle exchanges: edges cached by dst +
    broadcast state makes groupBy(dst) partition-complete."""
    e = generate_edges(spark, 50_000, 2_000)
    g = Graph.from_edges(e)
    shares = g.by_dst(8).select("src", "dst", (F.lit(1.0)).alias("share"))
    shares.count()  # materialize the dst-partitioned cache
    state = g.vertices().select(F.col("id").alias("src"), F.lit(0.1).alias("rank"))
    msgs = (
        shares.join(F.broadcast(state), "src")
        .select("dst", (F.col("rank") * F.col("share")).alias("m"))
        .groupBy("dst")
        .agg(F.sum("m").alias("msum"))
    )
    assert count_exchanges(msgs) == 0, "superstep plan must not shuffle"
    assert count_broadcast_joins(msgs) == 1


def test_fallback_superstep_plan_shape(spark):
    """The cluster-scale fallback (state_broadcast=False): edges stay
    in their cached src layout, the state shuffles into the src join
    (no broadcast of |V|-row state anywhere), and groupBy(dst) shuffles
    the (combined) messages — bounded shuffles, bounded memory."""
    e = generate_edges(spark, 50_000, 2_000)
    g = Graph.from_edges(e)
    g.edges.count()  # materialize the src-partitioned cache
    state = g.vertices().select(F.col("id").alias("src"), F.lit(0.1).alias("rank"))
    msgs = (
        g.edges.join(state.hint("shuffle_hash"), "src")
        .select("dst", (F.lit(1.0) * F.col("rank")).alias("m"))
        .groupBy("dst")
        .agg(F.sum("m").alias("msum"))
    )
    assert count_broadcast_joins(msgs) == 0, "fallback must not broadcast |V|-row state"
    assert 1 <= count_exchanges(msgs) <= 3


def test_cc_adaptive_frontier_broadcast_plan(spark):
    """CC's shuffle mode flips the shrunk frontier to a broadcast join:
    the late-superstep message plan with a broadcast frontier over the
    src-layout edges has exactly one shuffle (the message combine) and
    one broadcast join."""
    e = generate_edges(spark, 50_000, 2_000)
    g = Graph.from_edges(e)
    g.edges.count()
    frontier = g.vertices().limit(10).select(F.col("id").alias("src"), F.col("id").alias("comp"))
    msgs = (
        g.edges.join(F.broadcast(frontier), "src")
        .groupBy(F.col("dst").alias("id"))
        .agg(F.min("comp").alias("cand"))
    )
    assert count_broadcast_joins(msgs) == 1
    assert count_exchanges(msgs) == 1


def test_naive_plan_does_shuffle(spark):
    """Control: the same aggregation WITHOUT the dst layout shuffles —
    proving the inspection actually measures something."""
    e = generate_edges(spark, 50_000, 2_000)
    state = (
        e.select(F.col("src").alias("id")).distinct().select("id", F.lit(0.1).alias("rank"))
    )
    msgs = (
        e.join(state.withColumnRenamed("id", "src"), "src")
        .groupBy("dst")
        .agg(F.sum("rank").alias("msum"))
    )
    assert count_exchanges(msgs) >= 1


def test_symmetric_distinct_canonicalization_is_exchange_free(spark):
    """For a symmetric_distinct graph the canonical pair set must be a
    pure filter over the cached edges (zero exchanges); the general
    path pays a distinct shuffle. This is the structural guarantee
    behind the triangle/similarity fast path."""
    from okapi_spark.operators.triangles import _canonical

    e = generate_edges(spark, 20_000, 1_000)
    sym = e.select("src", "dst").filter("src < dst").distinct()
    sym = sym.unionByName(sym.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    g_fast = Graph.from_edges(sym, symmetric_distinct=True)
    g_fast.edges.count()  # materialize the cache
    g_slow = Graph(edges=g_fast.edges, symmetric_distinct=False)

    assert count_exchanges(_canonical(g_fast)) == 0
    assert count_exchanges(_canonical(g_slow)) >= 1


def test_shuffle_mode_superstep_builds_hash_not_sort(spark):
    """The cluster-scale fallback must stream the cached edges against
    a per-partition hash of the state (ShuffledHashJoin) — a
    SortMergeJoin would re-sort the full edge set every superstep
    (measured 5x slower per superstep at 240M edges)."""
    from okapi_spark.plans.inspect import plan_node_names

    e = generate_edges(spark, 50_000, 2_000)
    g = Graph.from_edges(e)
    shares = g.edges.select("src", "dst", F.lit(1.0).alias("share"))
    shares = shares.repartition(8, "src").persist()
    shares.count()
    state = g.vertices().select(F.col("id").alias("src"), F.lit(0.1).alias("rank"))
    msgs = (
        shares.join(state.hint("shuffle_hash"), "src")
        .select("dst", (F.col("rank") * F.col("share")).alias("m"))
        .groupBy("dst")
        .agg(F.sum("m").alias("msum"))
    )
    names = plan_node_names(msgs)
    assert any("ShuffledHashJoin" in n for n in names), names
    assert not any("SortMergeJoin" in n for n in names), names
    shares.unpersist()


def test_lpa_csr_kernel_plan_zero_exchange_zero_edge_scan(spark):
    """The staged LPA csr superstep must (a) add no shuffle exchange
    and (b) never rescan the edge table: after ``stage_blocks`` the
    per-superstep job is a P-row Range → mapInPandas — the edge bytes
    live in worker-cached / page-cached block files, not in the plan."""
    from okapi_spark.operators.lpa import _csr_best_labels, _lpa_pack
    from okapi_spark.plans.csr_blocks import (
        cleanup_blocks, default_block_dir, stage_blocks,
    )

    e = generate_edges(spark, 50_000, 2_000)
    g = Graph.from_edges(e)
    edges = (
        g.edges.select("src", "dst", F.lit(1.0).alias("weight"))
        .withColumn("pid", F.pmod(F.xxhash64("dst"), F.lit(8)).cast("int"))
        .repartition(8, "pid")
    )
    block_dir = default_block_dir(spark)
    staged = stage_blocks(edges, 8, _lpa_pack, "lpa", epoch=-1, block_dir=block_dir)
    assert staged == e.count()
    state = g.vertices().select("id", F.col("id").alias("lbl"))
    slot = [None]
    best = _csr_best_labels(
        spark, 8, 4, epoch=-1, block_dir=block_dir,
        state=state, bcast_slot=slot, n_rows=2_000,
    )
    try:
        assert count_exchanges(best) == 0, "csr superstep plan must not shuffle"
        plan = best._jdf.queryExecution().executedPlan().toString()
        assert "Range" in plan, plan
        for scan_marker in ("InMemoryTableScan", "Scan parquet", "Scan ExistingRDD"):
            assert scan_marker not in plan, f"superstep rescans edges:\n{plan}"
        # and it computes the right thing from the staged blocks
        assert best.count() > 0
    finally:
        if slot[0] is not None:
            slot[0].destroy()
        cleanup_blocks(block_dir)


def test_triangle_orientation_broadcast_plan(spark):
    """With the degree table inside the byte budget, orientation must
    add ZERO exchanges beyond the (map-side-combined) degree groupBy:
    both degree lookups are broadcast joins against the persisted
    |V|-row table, so the edge set is never re-exchanged. The
    shuffle_hash fallback was measured at 0.31 marginal scaling
    efficiency on executor JVMs — the chassis's raw-shuffle ceiling —
    precisely because it exchanged the edge set twice (BENCH.md r5
    triangles decomposition)."""
    from okapi_spark.operators.triangles import _canonical, _oriented
    from okapi_spark.plans.inspect import plan_node_names

    e = generate_edges(spark, 20_000, 1_000)
    sym = e.select("src", "dst").filter("src < dst").distinct()
    sym = sym.unionByName(sym.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    g = Graph.from_edges(sym, symmetric_distinct=True)
    g.edges.count()

    o, extras = _oriented(g)  # auto gate: 1k vertices -> broadcast
    names = plan_node_names(o)
    assert sum("BroadcastHashJoin" in n for n in names) == 2, names
    assert not any("ShuffledHashJoin" in n or "SortMergeJoin" in n for n in names), names
    # the two degree lookups broadcast the SAME persisted table —
    # ReuseExchange must dedupe the serial driver-side relation build
    # (one BroadcastExchange, one ReusedExchange), so the build cost
    # in the one-shot budget model is paid once
    full = o._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in full, full
    # symmetric_distinct canonical is a pure filter; the degree groupBy
    # reads the persisted (already materialized by the gate's count)
    # degree table, so the executing path carries no exchange at all
    assert count_exchanges(o) == 0, plan_node_names(o)
    for d in extras:
        d.unpersist()


def test_triangle_orientation_broadcast_equiv(spark):
    """Broadcast, shuffle_hash, and packed-array orientation paths must
    produce the identical oriented edge set (same rows, same carried
    deg) — the (deg, id) total order is shared by all three."""
    from okapi_spark.operators.triangles import _oriented

    e = generate_edges(spark, 20_000, 1_000)
    g = Graph.from_edges(e)
    o_b, ex_b = _oriented(g, deg_broadcast=True)
    o_s, ex_s = _oriented(g, deg_broadcast=False)
    o_a, ex_a = _oriented(g, deg_broadcast="array")
    rows_b = sorted(tuple(r) for r in o_b.collect())
    rows_s = sorted(tuple(r) for r in o_s.collect())
    rows_a = sorted(tuple(r) for r in o_a.collect())
    assert rows_b == rows_s == rows_a and len(rows_b) > 0
    for d in ex_b + ex_s + ex_a:
        d.unpersist()


def test_triangle_orientation_array_plan(spark):
    """The packed-array orientation (the mid-band auto mode, 64MB <
    |V|-relation ≤ 256MB array) must execute with ZERO exchanges and
    ZERO joins: the degree lookup rides a numpy sc.broadcast into
    mapInArrow, so the canonical edge scan maps straight to the
    oriented set."""
    from okapi_spark.operators.triangles import _canonical, _oriented
    from okapi_spark.plans.inspect import plan_node_names

    e = generate_edges(spark, 20_000, 1_000)
    sym = e.select("src", "dst").filter("src < dst").distinct()
    sym = sym.unionByName(sym.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    g = Graph.from_edges(sym, symmetric_distinct=True)
    g.edges.count()

    o, extras = _oriented(g, deg_broadcast="array")
    names = plan_node_names(o)
    assert not any("Join" in n for n in names), names
    assert count_exchanges(o) == 0, names
    # end-to-end through the triangle plan: counts must match the
    # auto (broadcast-at-this-|V|) plan
    from okapi_spark.operators.triangles import triangle_count

    expected = triangle_count(g)
    e1 = o.alias("e1")
    w = e1.join(
        o.alias("e2").hint("shuffle_hash"),
        (F.col("e1.u") == F.col("e2.u"))
        & (F.struct(F.col("e1.dv"), F.col("e1.v")) < F.struct(F.col("e2.dv"), F.col("e2.v"))),
        "inner",
    ).select(F.col("e1.v").alias("b"), F.col("e2.v").alias("c"))
    closing = o.select(F.col("u").alias("b"), F.col("v").alias("c")).hint("shuffle_hash")
    got = w.join(closing, ["b", "c"], "left_semi").count()
    assert got == expected > 0
    for d in extras:
        d.unpersist()
