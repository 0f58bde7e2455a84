"""K-core decomposition — graphs/KCore.java:50-109.

Reference: vertices with degree < k remove themselves (messages tell
neighbors to prune the edge; a VertexResolver stops deleted vertices
resurrecting, :99-108). Spark: the graph-mutation loop is a functional
edge-set rebuild — degrees → dead set → anti-join — with lineage
truncated by localCheckpoint every round (SURVEY.md §2.a graph
mutation mapping). The anti-join replaces the resolver: removed
vertices simply no longer appear on either side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from okapi_spark.graph.graph import Graph


def kcore(graph: Graph, k: int, max_rounds: int = 500) -> Graph:
    """The k-core subgraph (possibly empty)."""
    edges = graph.edges.select("src", "dst", "weight").localCheckpoint(eager=True)
    for _ in range(max_rounds):
        deg = edges.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("deg"))
        dead = deg.filter(F.col("deg") < k).select("id")
        n_dead = dead.count()
        if n_dead == 0:
            break
        dead = F.broadcast(dead)
        edges = (
            edges.join(dead.withColumnRenamed("id", "src"), "src", "left_anti")
            .join(dead.withColumnRenamed("id", "dst"), "dst", "left_anti")
            .select("src", "dst", "weight")
            .localCheckpoint(eager=True)
        )
    return Graph(edges=edges)


def kcore_vertices(graph: Graph, k: int) -> DataFrame:
    """(id) vertices surviving in the k-core."""
    return kcore(graph, k).vertices()
