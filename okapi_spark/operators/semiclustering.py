"""Semi-clustering — graphs/SemiClustering.java:61-495 (Pregel paper §?).

Each vertex maintains at most ``max_clusters`` semi-clusters it belongs
to, scored ``S = (I − f·B) / (n(n−1)/2)`` with I = internal edge
weight, B = boundary edge weight, updated INCREMENTALLY on vertex add
(addVertex :338-360: singleton → score 0, boundary = weighted degree;
join → edges into the cluster move boundary→inner). Per superstep a
vertex unions the cluster sets received from neighbors, extends every
cluster that doesn't contain it and isn't at ``cluster_capacity``,
keeps the top ``max_clusters`` as its value (clusters containing it)
and sends the top unioned set onward; fixed ``iterations`` rounds
(defaults 10/2/4/0.5, :67-79).

Spark state: (id, value array<cluster>, outbox array<cluster>) with
cluster = struct(vs array<long>, inner double, boundary double,
score double) — the reference's TreeSet-of-SemiCluster as a bounded
array-of-struct column (SURVEY.md §1.5). The per-vertex kernel runs in
``applyInPandas`` over messages grouped by destination, joined with a
per-vertex adjacency map for the incremental rescoring. The
reference's TreeSet comparator breaks score ties arbitrarily
(:187-198); we break them by the sorted vertex tuple for determinism.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from okapi_spark.graph.graph import Graph

CLUSTER_T = "array<struct<vs: array<bigint>, inner: double, boundary: double, score: double>>"


def semi_clustering(
    graph: Graph,
    iterations: int = 10,
    max_clusters: int = 2,
    cluster_capacity: int = 4,
    score_factor: float = 0.5,
) -> DataFrame:
    """Returns (id, clusters) where clusters is the vertex's final
    array of semi-clusters (each: vs, inner, boundary, score)."""
    spark = graph.edges.sparkSession
    edges = graph.edges.select("src", "dst", "weight")
    adj = (
        edges.groupBy(F.col("src").alias("id"))
        .agg(F.map_from_entries(F.collect_list(F.struct("dst", "weight"))).alias("nbrs"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    adj.count()

    # superstep 0: singleton cluster; boundary = weighted degree, score 0
    singleton = F.array(
        F.struct(
            F.array(F.col("id")).alias("vs"),
            F.lit(0.0).alias("inner"),
            F.aggregate(F.map_values("nbrs"), F.lit(0.0), lambda a, x: a + x).alias("boundary"),
            F.lit(0.0).alias("score"),
        )
    )
    state = adj.select("id", singleton.alias("value"), singleton.alias("outbox"))
    state = state.localCheckpoint(eager=True)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        """One destination vertex: union received cluster sets, extend,
        trim, emit (value, outbox)."""
        me = int(pdf["me"].iloc[0])
        nbrs = pdf["nbrs"].iloc[0]
        nbr_map = dict(zip(nbrs["key"], nbrs["value"])) if isinstance(nbrs, dict) is False and nbrs is not None else (nbrs or {})
        if isinstance(nbrs, dict):
            nbr_map = nbrs
        deg_w = sum(nbr_map.values())

        def key(c):
            return tuple(sorted(c[0]))

        unioned: dict[tuple, tuple] = {}
        value: dict[tuple, tuple] = {}

        def add(store, c):
            k = key(c)
            if k not in store:
                store[k] = c

        def extend(c):
            vs, inner, boundary, _ = c
            w_to_cluster = sum(nbr_map.get(v, 0.0) for v in vs)
            n_inner = inner + w_to_cluster
            n_boundary = boundary - w_to_cluster + (deg_w - w_to_cluster)
            n = len(vs) + 1
            n_score = (n_inner - score_factor * n_boundary) / (n * (n - 1) / 2)
            return (sorted(list(vs) + [me]), n_inner, n_boundary, n_score)

        for clusters in pdf["clusters"]:
            for c in clusters:
                c = (list(c["vs"]), float(c["inner"]), float(c["boundary"]), float(c["score"]))
                add(unioned, c)
                if me in c[0]:
                    add(value, c)
                elif len(c[0]) < cluster_capacity:
                    nc = extend(c)
                    add(unioned, nc)
                    add(value, nc)

        def top(store):
            # keep max_clusters by (score desc, vertex-tuple asc)
            items = sorted(store.values(), key=lambda c: (-c[3], tuple(c[0])))
            return items[:max_clusters]

        def pack(cs):
            return [
                {"vs": [int(v) for v in c[0]], "inner": c[1], "boundary": c[2], "score": c[3]}
                for c in cs
            ]

        return pd.DataFrame({"id": [me], "value": [pack(top(value))], "outbox": [pack(top(unioned))]})

    for _ in range(iterations - 1):
        msgs = (
            edges.join(
                state.select(F.col("id").alias("src"), "outbox"), "src"
            ).select(F.col("dst").alias("me"), F.col("outbox").alias("clusters"))
        )
        with_adj = msgs.join(adj.withColumnRenamed("id", "me"), "me")
        new_state = with_adj.groupBy("me").applyInPandas(
            kernel, schema=f"id bigint, value {CLUSTER_T}, outbox {CLUSTER_T}"
        )
        # vertices with no in-messages keep their state (reference: no
        # messages → not reactivated)
        state = (
            state.join(new_state.withColumnRenamed("id", "nid"), state["id"] == F.col("nid"), "left")
            .select(
                state["id"],
                F.coalesce(new_state["value"], state["value"]).alias("value"),
                F.coalesce(new_state["outbox"], state["outbox"]).alias("outbox"),
            )
            .localCheckpoint(eager=True)
        )

    return state.select("id", F.col("value").alias("clusters"))
