"""k-means clustering — clustering/kmeans/KMeansClustering.java:35-274.

Reference: points are vertices with no edges; superstep 0 samples
random initial centers through a list aggregator (:70-81); each round
assigns every point to the nearest center by euclidean distance
(:127-157), aggregates per-center coordinate sums + counts, and the
master recomputes means, halting when total center movement < 0.001
(:190-260).

Spark: centers are k rows collected to the driver and folded into the
assignment expression as literals (the "broadcast centers" pattern) —
the distance argmin is pure JVM ``aggregate``/``zip_with`` column math,
no UDF; the update is one groupBy. Initial centers are the k points
with smallest xxhash64(id, seed): deterministic, partitioning-
independent (replaces the reference's Random, :432 equivalent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kmeans(
    points: DataFrame,
    k: int,
    max_iterations: int = 100,
    tol: float = 0.001,
    seed: int = 42,
    init_centers: list[list[float]] | None = None,
) -> tuple[DataFrame, list[list[float]]]:
    """points: (id long, features array<double>). Returns
    ((id, cluster), final_centers).

    ``init_centers``: explicit initial centers (oracle-parity mode —
    fixed centers make every Lloyd round SQL-reproducible); default is
    the deterministic hash-sampled init. With ``tol=0`` the loop runs
    exactly ``max_iterations`` assign+update rounds."""
    pts = points.select("id", F.col("features").cast("array<double>").alias("features"))
    pts = pts.localCheckpoint(eager=True)

    if init_centers is not None:
        centers = [list(map(float, c)) for c in init_centers]
        if len(centers) != k:
            raise ValueError(f"init_centers has {len(centers)} rows, expected k={k}")
    else:
        init = (
            pts.withColumn("h", F.xxhash64("id", F.lit(seed)))
            .orderBy("h")
            .limit(k)
            .select("features")
            .collect()
        )
        centers = [list(r.features) for r in init]
    dim = len(centers[0])

    def dist2(center: list[float]):
        c = F.array(*[F.lit(float(x)) for x in center])
        return F.aggregate(
            F.zip_with(F.col("features"), c, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    assigned = None
    for _ in range(max_iterations):
        d = pts
        # argmin over k distance columns, tie → lowest cluster index
        dist_arr = F.array(*[dist2(c) for c in centers])
        d = d.withColumn(
            "cluster",
            F.array_position(dist_arr, F.array_min(dist_arr)).cast("int") - 1,
        )
        sums = d.groupBy("cluster").agg(
            *[F.sum(F.col("features")[i]).alias(f"s{i}") for i in range(dim)],
            F.count("*").alias("n"),
        )
        rows = {int(r.cluster): r for r in sums.collect()}
        new_centers = []
        movement = 0.0
        for ci, c in enumerate(centers):
            if ci in rows:
                r = rows[ci]
                nc = [r[f"s{i}"] / r["n"] for i in range(dim)]
            else:
                nc = c  # empty cluster keeps its center (reference keeps old mean)
            movement += sum((a - b) ** 2 for a, b in zip(nc, c)) ** 0.5
            new_centers.append(nc)
        centers = new_centers
        assigned = d.select("id", "cluster")
        if movement < tol:
            break
    return assigned, centers
