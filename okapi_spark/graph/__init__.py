from okapi_spark.graph.graph import Graph
from okapi_spark.graph.induce import induce_edges, vertices_table

__all__ = ["Graph", "induce_edges", "vertices_table"]
