"""Connected components — HashMin/HCC min-label propagation.

Reference semantics (graphs/ConnectedComponents.java:42-97): component
id = minimum vertex id reachable; a vertex updates to the min of its
own label and incoming neighbor labels, and propagates ONLY on
improvement (send-on-change, lines 80-94) — the frontier shrinks every
superstep, converging when no label changes. Exact integer fixpoint.

Spark plan per superstep: scatter = frontier ⋈ edges on src (the
frontier is broadcast when small — SURVEY.md §4.2.5), combine =
groupBy(dst).min (Catalyst partial agg = Giraph's combiner), apply =
left join against state + ``least``. State carries a ``changed`` flag
so the loop's halt condition is a metric already computed by the agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from okapi_spark.bsp import BSPResult, CheckpointStore, run_supersteps
from okapi_spark.graph.graph import Graph

# below this many frontier rows, hint a broadcast join into the scatter
BROADCAST_FRONTIER_ROWS = 2_000_000


def connected_components(
    graph: Graph,
    max_supersteps: int = 200,
    store: CheckpointStore | None = None,
    num_partitions: int | None = None,
) -> BSPResult:
    """Returns BSPResult state (id long, comp long)."""
    spark = graph.edges.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism

    # dst-partitioned scatter layout: frontier broadcast + partition-
    # complete min-agg ⇒ zero shuffle exchanges per superstep
    edges = graph.by_dst(num_partitions).select("src", "dst")
    vertices = graph.vertices().repartition(num_partitions, "id").persist(StorageLevel.MEMORY_AND_DISK)
    vertices.count()

    # superstep 0 of the reference folds the local min over neighbors;
    # here the uniform loop does it — same fixpoint, one extra round.
    state0 = vertices.select("id", F.col("id").alias("comp"), F.lit(True).alias("changed"))

    n_edges = graph.num_edges()

    def superstep(ss: int, state: DataFrame):
        frontier = F.broadcast(state.filter("changed").select(F.col("id").alias("src"), "comp"))
        msgs = (
            edges.join(frontier, "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("comp").alias("cand"))
        )
        new_state = state.join(msgs, "id", "left").select(
            "id",
            F.least("comp", F.coalesce("cand", "comp")).alias("comp"),
            (F.coalesce("cand", "comp") < F.col("comp")).alias("changed"),
        )

        def post(materialized: DataFrame) -> dict:
            n_changed = materialized.filter("changed").count()
            return {"changed": n_changed, "edges_processed": n_edges}

        return new_state, post

    res = run_supersteps(
        state0,
        superstep,
        max_supersteps=max_supersteps,
        halt_fn=lambda ss, m: m["changed"] == 0,
        store=store,
    )
    res.state = res.state.select("id", "comp")
    return res
