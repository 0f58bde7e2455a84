"""Similarity search over embedding columns (array<float>).

* ``cosine_topk`` — brute-force exact top-k: broadcast the query set,
  JVM-side dot products via ``zip_with``/``aggregate`` (no UDF),
  window row_number ≤ k with a deterministic tie-break. This is the
  baseline/oracle path.
* ``lsh_topk`` — random-hyperplane LSH: hash-derived deterministic
  hyperplanes bucket vectors by sign pattern; search only the query's
  bucket (multi-probe over Hamming-1 neighbors for recall). The scale
  path: the bucket join replaces the cross product.
* ``ivf_topk`` — inverted-file ANN: k-means coarse codebook → Voronoi
  cells → nprobe-cell scan + exact rerank (the FAISS-IVF layout,
  composed from this engine's own kmeans operator).
* ``cosine_near_dups`` — pairs with cosine ≥ τ (embedding near-dup
  dedup tier); LSH-table blocking by default, brute force as the
  small-n oracle path.

Scale notes: brute force is O(|Q|·|D|) but embarrassingly parallel
(broadcast Q); LSH makes the candidate set ~|D|/2^bits per probe;
IVF makes it ~|D|·nprobe/nlist per query.
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
    method: str = "lsh",
    bits: int = 8,
    tables: int = 4,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """(a, b, sim ≥ τ) embedding near-duplicate pairs (a < b).

    ``method="lsh"`` (default, the scale path): candidates are pairs
    sharing a full sign-pattern bucket in ANY of ``tables`` independent
    random-hyperplane tables — a uniform-key equi-join on
    (table, bucket), exactly the MinHash-LSH band pattern; candidates
    are then verified by exact cosine. Recall is probabilistic:
    P(same bit) = 1 − θ/π, so at τ=0.95 (θ≈18°) a pair survives one
    8-bit table w.p. ≈0.43 and is missed by all 4 tables w.p. ≈0.1;
    raise ``tables``/lower ``bits`` for higher recall. Candidate count
    per table ≈ n²/2^bits under uniform buckets — no O(n²) cross join.

    ``method="exact"``: the brute-force all-pairs baseline — the
    small-n oracle the LSH path is tested against.
    """
    d = embeddings.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    if method == "exact":
        a = d.select(F.col("id").alias("a"), F.col("v").alias("va"))
        b = d.select(F.col("id").alias("b"), F.col("v").alias("vb"))
        return (
            a.crossJoin(b)
            .filter(F.col("a") < F.col("b"))
            .select("a", "b", F.round(cosine(F.col("va"), F.col("vb")), 9).alias("sim"))
            .filter(F.col("sim") >= threshold)
        )
    if method != "lsh":
        raise ValueError(f"unknown method {method!r} (use 'lsh' or 'exact')")
    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    banded = None
    for t in range(tables):
        planes = [_hyperplane(dim, t * bits + i, seed) for i in range(bits)]
        part = d.select(
            "id", "v", F.lit(t).alias("table"), lsh_bucket(F.col("v"), planes).alias("bucket")
        )
        banded = part if banded is None else banded.unionByName(part)
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.table") == F.col("b.table"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("a"), F.col("b.id").alias("b"),
            F.col("a.v").alias("va"), F.col("b.v").alias("vb"),
        )
        .dropDuplicates(["a", "b"])
    )
    return (
        cand.select("a", "b", F.round(cosine(F.col("va"), F.col("vb")), 9).alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    train_iterations: int = 5,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, vec_id, sim) IVF approximate top-k — the classic
    inverted-file ANN layout: a coarse k-means codebook of ``nlist``
    centroids partitions the corpus into cells (the Voronoi inverted
    lists); each query scans only its ``nprobe`` nearest cells and
    candidates are reranked by exact cosine.

    Built by composing the engine's own operators: the codebook is
    :func:`okapi_spark.operators.kmeans.kmeans` on the corpus, cell
    assignment and probe selection are JVM column expressions over the
    (small, broadcast-as-literals) centroid table, and the cell join is
    a uniform equi-join — candidates per query ≈ |D|·nprobe/nlist, no
    cross product. ``nprobe == nlist`` degenerates to exact search
    (recall 1.0), the property the test pins.
    """
    from okapi_spark.operators.kmeans import kmeans as _kmeans

    pts = embeddings.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("features")
    )
    _, centers = _kmeans(pts, k=nlist, max_iterations=train_iterations, tol=0.0, seed=seed)

    def dist2(center: list[float]) -> Column:
        c = F.array(*[F.lit(float(x)) for x in center])
        return F.aggregate(
            F.zip_with(F.col("v"), c, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    def with_cells(df: DataFrame, n_cells: int) -> DataFrame:
        """cells = indices of the n_cells nearest centroids (ascending
        distance, ties by cell index)."""
        darr = F.array(*[
            F.struct(dist2(c).alias("d"), F.lit(i).alias("cell")) for i, c in enumerate(centers)
        ])
        ordered = F.slice(F.array_sort(darr), 1, n_cells)
        return df.withColumn("cells", F.transform(ordered, lambda s: s["cell"]))

    d = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    d = with_cells(d, 1).select("vec_id", F.col("v").alias("dv"), F.element_at("cells", 1).alias("cell"))
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    q = with_cells(q, min(nprobe, nlist)).select(
        "query_id", F.col("v").alias("qv"), F.explode("cells").alias("cell")
    )
    scored = (
        d.join(q, "cell")
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
