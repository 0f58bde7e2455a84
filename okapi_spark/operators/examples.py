"""Example computations — examples/* parity.

* ``count_in_edges`` — SimpleCountInEdgesVertex.java:33-44: per-vertex
  count of incoming edges. One hash aggregation.
* ``identity`` — SimpleIdentityComputation.java:30: the no-op.
* ``master_compute_demo`` — SimpleMasterComputeVertex.java:32-106: a
  driver-side loop reading a global aggregate each superstep and
  rebroadcasting it (DoubleOverwriteAggregator → a driver variable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from okapi_spark.bsp import run_supersteps
from okapi_spark.graph.graph import Graph


def count_in_edges(graph: Graph) -> DataFrame:
    return graph.in_degrees()


def identity(df: DataFrame) -> DataFrame:
    return df


def master_compute_demo(graph: Graph, supersteps: int = 3) -> list[float]:
    """Each superstep: state value += 1; the master reads avg(value)
    and carries it — the aggregator round-trip pattern."""
    observed: list[float] = []
    state0 = graph.vertices().select("id", F.lit(0.0).alias("value"))

    def step(ss: int, state: DataFrame):
        new_state = state.select("id", (F.col("value") + 1.0).alias("value"))

        def post(m: DataFrame) -> dict:
            avg = m.agg(F.avg("value")).collect()[0][0]
            observed.append(float(avg))
            return {"avg": float(avg)}

        return new_state, post

    run_supersteps(state0, step, max_supersteps=supersteps)
    return observed
