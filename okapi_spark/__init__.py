"""okapi_spark — a PySpark-native link-graph analytics engine.

A from-scratch reimplementation of the graph-mining capabilities of
grafos-ml/okapi (a Giraph/Hadoop BSP library) as idiomatic Spark
DataFrame programs: iterative supersteps expressed as join/agg plans or
partition-local CSR gather-scatter inside vectorized pandas/Arrow UDFs,
driven by a driver-side master loop with checkpointed, resumable state.

Nothing here is a port: the reference (see /root/reference, cited by
file:line throughout) defines WHAT each operator computes — per-vertex
semantics, message protocols, convergence rules — while the execution
strategy is Catalyst-first Spark.
"""

from okapi_spark.session import get_spark
from okapi_spark.graph.graph import Graph

__version__ = "0.1.0"
__all__ = ["get_spark", "Graph", "__version__"]
