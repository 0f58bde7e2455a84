"""Deterministic synthetic source-code-repository corpus.

Generates the engine's primary input table
``documents(repo, path, commit, lang, content)`` (shape per
BASELINE.json input_hint) entirely Spark-side — ``spark.range`` plus
hash-derived columns, zero Python in the row path — so the same
generator that makes a 5k-row test fixture would make a 10^12-row
corpus on a cluster, partition-parallel and seed-stable regardless of
partitioning.

Skew fixture: file ids are drawn from an inverse-transform Zipf so a
few paths are touched by many commits (hub vertices after edge
induction), exercising the salted/AQE skew paths downstream.

Integrity invariant: ``content_hashes`` records sha2(content, 256) at
generation time; ingest must reproduce it row-for-row (north rule
"content sha256 equality"; verified in tests/test_corpus.py with an
independent hashlib oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["py", "java", "scala", "sql", "md"]

# sf → row count, matching FIXTURES.md §1 scales.
ROWS_PER_SF = 5_000_000


def _u01(col, salt: str):
    """Deterministic uniform(0,1] derived from a hash — partitioning-
    independent randomness (SURVEY.md §4.2.6)."""
    h = F.xxhash64(col, F.lit(salt))
    return (F.pmod(h, F.lit(1_000_000_000)).cast("double") + 1.0) / 1_000_000_000.0


def generate_documents(
    spark: SparkSession,
    sf: float = 0.001,
    seed: int = 42,
    zipf_alpha: float = 1.8,
    partitions: int | None = None,
) -> DataFrame:
    """Build the documents table at scale factor ``sf``.

    Layout: ~rows/6 commits, each touching ~6 files of its repo; file
    popularity is Zipf(alpha) so low file-ids are hubs.
    """
    rows = max(1000, int(ROWS_PER_SF * sf))
    n_repos = max(4, rows // 500)
    files_per_repo = max(50, rows // (n_repos * 3))
    commits_per_repo = max(8, rows // (n_repos * 6))

    if partitions is None:
        partitions = max(4, spark.sparkContext.defaultParallelism)
    base = spark.range(0, rows, 1, partitions).withColumnRenamed("id", "i")
    s = F.lit(seed)

    repo_id = F.pmod(F.xxhash64("i", F.lit("repo"), s), F.lit(n_repos))
    commit_id = F.pmod(F.xxhash64("i", F.lit("commit"), s), F.lit(commits_per_repo))
    # Zipf via inverse transform: f = floor(u^(-1/(alpha-1))) - 1, capped.
    u = _u01(F.col("i"), f"file:{seed}")
    file_id = F.least(
        F.floor(F.pow(u, F.lit(-1.0 / (zipf_alpha - 1.0)))) - 1,
        F.lit(files_per_repo - 1),
    ).cast("long")
    module_id = F.pmod(F.xxhash64(file_id, F.lit("module"), s), F.lit(16))
    lang_idx = F.pmod(F.xxhash64(file_id, repo_id, F.lit("lang"), s), F.lit(len(LANGS)))

    repo = F.format_string("repo%04d", repo_id)
    commit = F.substring(F.sha2(F.concat_ws(":", repo, commit_id.cast("string")), 256), 1, 40)
    lang = F.element_at(F.array(*[F.lit(x) for x in LANGS]), lang_idx.cast("int") + 1)
    path = F.concat(F.format_string("src/m%02d/f%04d.", module_id, file_id), lang)
    df = base.select(
        repo.alias("repo"), path.alias("path"), commit.alias("commit"), lang.alias("lang")
    )
    # One row per (repo, path, commit): a commit touches a file once.
    df = df.dropDuplicates(["repo", "path", "commit"])

    # content = header line + deterministic pseudo-text derived from the key.
    key = F.concat_ws("@", F.concat_ws("/", "repo", "path"), "commit")
    chunks = [F.sha2(F.concat(key, F.lit(f"#chunk{j}")), 256) for j in range(4)]
    content = F.concat(key, F.lit("\n"), F.concat_ws(" ", *chunks))
    return df.select("repo", "path", "commit", "lang", content.alias("content"))


def content_hashes(documents: DataFrame) -> DataFrame:
    """Generator-recorded sha256 per row — the integrity ledger the
    ingest path is checked against (north rule content-sha256 parity)."""
    return documents.select(
        "repo", "path", "commit", F.sha2("content", 256).alias("content_sha256")
    )


def write_corpus(spark: SparkSession, out_dir: str, sf: float, seed: int = 42) -> None:
    docs = generate_documents(spark, sf=sf, seed=seed)
    docs.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")
    written = spark.read.parquet(f"{out_dir}/documents.parquet")
    content_hashes(written).write.mode("overwrite").parquet(f"{out_dir}/content_hashes.parquet")


def verify_content_integrity(documents: DataFrame, hashes: DataFrame) -> int:
    """Rows whose recomputed sha2 mismatches the recorded ledger (0 == intact)."""
    recomputed = documents.select(
        "repo", "path", "commit", F.sha2("content", 256).alias("h2")
    )
    joined = recomputed.join(hashes, ["repo", "path", "commit"], "full_outer")
    return joined.filter(
        F.col("h2").isNull()
        | F.col("content_sha256").isNull()
        | (F.col("h2") != F.col("content_sha256"))
    ).count()
