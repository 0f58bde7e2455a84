"""Similarity search over embedding columns (array<float>).

* ``cosine_topk`` — brute-force exact top-k: broadcast the query set,
  JVM-side dot products via ``zip_with``/``aggregate`` (no UDF),
  window row_number ≤ k with a deterministic tie-break. This is the
  baseline/oracle path.
* ``lsh_topk`` — random-hyperplane LSH: hash-derived deterministic
  hyperplanes bucket vectors by sign pattern; search only the query's
  bucket (multi-probe over Hamming-1 neighbors for recall). The scale
  path: the bucket join replaces the cross product.
* ``cosine_near_dups`` — all pairs with cosine ≥ τ (embedding near-dup
  dedup tier).

Scale notes: brute force is O(|Q|·|D|) but embarrassingly parallel
(broadcast Q); LSH makes the candidate set ~|D|/2^bits per probe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, vec_id, sim) — exact top-k neighbors per query
    (self-matches excluded); ties broken by ascending vec_id."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv")
    )
    d = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("dv")
    )
    scored = (
        d.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", F.round(cosine(F.col("qv"), F.col("dv")), 9).alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "vec_id", "sim")
    )


def _hyperplane(dim: int, plane: int, seed: int) -> list[float]:
    """Deterministic pseudo-random hyperplane from integer hashing
    (no RNG state; same on every worker/run)."""
    import numpy as np

    vals = np.array(
        [((hash_u32(plane * 100_003 + j * 31 + seed) / 2**32) * 2 - 1) for j in range(dim)]
    )
    return [float(x) for x in vals]


def hash_u32(x: int) -> int:
    x = (x ^ (x >> 16)) * 0x45D9F3B & 0xFFFFFFFF
    x = (x ^ (x >> 16)) * 0x45D9F3B & 0xFFFFFFFF
    return (x ^ (x >> 16)) & 0xFFFFFFFF


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-pattern bucket id for a vector against fixed hyperplanes."""
    bucket = F.lit(0)
    for i, p in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in p])
        bucket = bucket + F.when(_dot(vec, arr) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    bits: int = 8,
    dim: int | None = None,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe: bool = True,
) -> DataFrame:
    """(query_id, vec_id, sim) approximate top-k: candidates restricted
    to the query's LSH bucket (± Hamming-1 probes)."""
    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    planes = [_hyperplane(dim, i, seed) for i in range(bits)]

    d = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("dv")
    ).withColumn("bucket", lsh_bucket(F.col("dv"), planes))
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv")
    ).withColumn("qbucket", lsh_bucket(F.col("qv"), planes))
    if multiprobe:
        probes = F.array(*([F.col("qbucket")] + [F.col("qbucket").bitwiseXOR(F.lit(1 << i)) for i in range(bits)]))
        q = q.withColumn("bucket", F.explode(probes))
    else:
        q = q.withColumn("bucket", F.col("qbucket"))

    scored = (
        d.join(F.broadcast(q.select("query_id", "qv", "bucket")), "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", F.round(cosine(F.col("qv"), F.col("dv")), 9).alias("sim"))
        .dropDuplicates(["query_id", "vec_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "vec_id", "sim")
    )


def cosine_near_dups(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(a, b, sim ≥ τ) embedding near-duplicate pairs (a < b).
    Brute-force self-join baseline; swap in lsh buckets for scale."""
    d = embeddings.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    a = d.select(F.col("id").alias("a"), F.col("v").alias("va"))
    b = d.select(F.col("id").alias("b"), F.col("v").alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", F.round(cosine(F.col("va"), F.col("vb")), 9).alias("sim"))
        .filter(F.col("sim") >= threshold)
    )
