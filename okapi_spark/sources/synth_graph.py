"""Direct deterministic synthetic edge generator for scale benches.

Power-law-ish directed multigraph: src drawn Zipf(alpha) (hub skew),
dst uniform, both hash-derived from the row index — fully distributed,
partitioning-independent, no Python row path. Used where building the
graph through the corpus→induction pipeline would dominate the bench.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def generate_edges(
    spark: SparkSession,
    n_edges: int,
    n_vertices: int,
    zipf_alpha: float = 1.6,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism
    base = spark.range(0, n_edges, 1, partitions)
    u_src = (F.pmod(F.xxhash64("id", F.lit(f"src:{seed}")), F.lit(10**9)).cast("double") + 1.0) / 1e9
    src = F.least(
        F.floor(F.pow(u_src, F.lit(-1.0 / (zipf_alpha - 1.0)))) - 1, F.lit(n_vertices - 1)
    ).cast("long")
    dst = F.pmod(F.xxhash64("id", F.lit(f"dst:{seed}")), F.lit(n_vertices)).cast("long")
    e = base.select(src.alias("src"), dst.alias("dst"), F.lit(1.0).alias("weight"))
    return e.filter(F.col("src") != F.col("dst"))
