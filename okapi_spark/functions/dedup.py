"""Deduplication operators for training-data pipelines.

Five tiers, all Spark-declarative (no Python row path) and
deterministic, so the small-scale results are exactly reproducible by
a SQL oracle where one exists:

* exact            — hash-groupBy on a normalized-content fingerprint
* minhash_lsh      — shingles → MinHash signature → banded LSH buckets
                     → candidate pairs → exact-Jaccard verification.
                     Hash = md5 hex (lexicographic min), chosen because
                     both Spark and DuckDB implement identical md5 —
                     the whole pipeline is oracle-checkable.
* simhash          — 16-bit SimHash (per-bit weighted majority over
                     token hashes) + Hamming-≤k near-dup pairs
* ngram_jaccard    — exact word-n-gram Jaccard for pairs sharing ≥1
                     shingle (the blocking condition keeps the
                     self-join linear in shingle postings)
* embedding cosine — near-dup pairs by cosine ≥ τ over an
                     array<float> column (see simsearch.cosine)

Scale notes: shingle postings lists are the shuffle unit; hub shingles
(boilerplate) are capped with a document-frequency filter exactly like
hub vertices in the graph ops. LSH band-bucket join is an equi-join on
(band_id, bucket_hash) — uniform keys, no skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(fingerprint, n_dups, keep_id, dup_ids): groups with ≥2 docs
    sharing a normalized-content sha256; keep = min id."""
    from okapi_spark.functions.text import fingerprint

    return (
        df.select(F.col(id_col).alias("id"), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(
            F.count("*").alias("n_dups"),
            F.min("id").alias("keep_id"),
            F.sort_array(F.collect_list("id")).alias("dup_ids"),
        )
        .filter(F.col("n_dups") >= 2)
        .select(F.col("fp").alias("fingerprint"), "n_dups", "keep_id", "dup_ids")
    )


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """df minus exact duplicates (keeps min-id representative)."""
    from okapi_spark.functions.text import fingerprint

    keyed = df.withColumn("__fp", fingerprint(F.col(text_col)))
    keep = keyed.groupBy("__fp").agg(F.min(id_col).alias(id_col))
    return keyed.join(keep, [ "__fp", id_col], "left_semi").drop("__fp")


def shingles(df: DataFrame, text_col: str, id_col: str, n: int = 3,
             max_doc_freq: int | None = None) -> DataFrame:
    """(id, shingle) distinct word-n-gram postings; shingles appearing
    in more than ``max_doc_freq`` docs are dropped (boilerplate cap —
    the skew guard)."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), " "), lambda t: t != "")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    out = (
        df.select(F.col(id_col).alias("id"), F.explode(grams).alias("shingle"))
        .filter(F.length("shingle") > 0)
        .distinct()
    )
    if max_doc_freq:
        freq = out.groupBy("shingle").agg(F.count("*").alias("df"))
        out = out.join(
            F.broadcast(freq.filter(F.col("df") > max_doc_freq).select("shingle")),
            "shingle",
            "left_anti",
        )
    return out


def minhash_signatures(post: DataFrame, num_hashes: int = 8) -> DataFrame:
    """(id, h0..h{m-1}) — MinHash over md5(shingle || '#' || i);
    min taken lexicographically on the hex digest (same in DuckDB)."""
    aggs = [
        F.min(F.md5(F.concat(F.col("shingle"), F.lit(f"#{i}")))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return post.groupBy("id").agg(*aggs)


def lsh_candidate_pairs(sigs: DataFrame, num_hashes: int = 8, bands: int = 4) -> DataFrame:
    """(a, b) candidate pairs sharing ≥1 LSH band bucket (a < b)."""
    rows_per_band = num_hashes // bands
    buckets = []
    for b in range(bands):
        cols = [F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
        buckets.append(
            sigs.select(
                "id",
                F.lit(b).alias("band"),
                F.md5(F.concat_ws("|", *cols)).alias("bucket"),
            )
        )
    all_b = buckets[0]
    for x in buckets[1:]:
        all_b = all_b.unionByName(x)
    l, r = all_b.alias("l"), all_b.alias("r")
    return (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
        .distinct()
    )


def verify_jaccard(pairs: DataFrame, post: DataFrame) -> DataFrame:
    """(a, b, jaccard) exact shingle-set Jaccard for candidate pairs."""
    sizes = post.groupBy("id").agg(F.count("*").alias("sz"))
    pa = post.withColumnRenamed("id", "a")
    pb = post.withColumnRenamed("id", "b")
    inter = (
        pairs.join(pa, "a").join(pb, ["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count("*").alias("common"))
    )
    return (
        pairs.join(inter, ["a", "b"], "left")
        .join(sizes.withColumnRenamed("id", "a").withColumnRenamed("sz", "sa"), "a")
        .join(sizes.withColumnRenamed("id", "b").withColumnRenamed("sz", "sb"), "b")
        .select(
            "a", "b",
            F.round(
                F.coalesce("common", F.lit(0)).cast("double")
                / (F.col("sa") + F.col("sb") - F.coalesce("common", F.lit(0))),
                9,
            ).alias("jaccard"),
        )
    )


def minhash_lsh_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    threshold: float = 0.7,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """(a, b, jaccard) near-duplicate pairs: LSH candidates verified at
    ``jaccard ≥ threshold`` — the full shingle→minhash→band→verify
    pipeline."""
    post = shingles(df, text_col, id_col, n, max_doc_freq).persist()
    sigs = minhash_signatures(post, num_hashes)
    cand = lsh_candidate_pairs(sigs, num_hashes, bands)
    return verify_jaccard(cand, post).filter(F.col("jaccard") >= threshold)


def ngram_jaccard_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    n: int = 3, threshold: float = 0.5, max_doc_freq: int | None = 1000,
) -> DataFrame:
    """(a, b, jaccard ≥ threshold) for every pair sharing ≥1 n-gram —
    exact (no LSH recall loss), blocked on the shingle postings."""
    post = shingles(df, text_col, id_col, n, max_doc_freq).persist()
    pa, pb = post.alias("pa"), post.alias("pb")
    cand = (
        pa.join(pb, (F.col("pa.shingle") == F.col("pb.shingle")) & (F.col("pa.id") < F.col("pb.id")))
        .select(F.col("pa.id").alias("a"), F.col("pb.id").alias("b"))
        .distinct()
    )
    return verify_jaccard(cand, post).filter(F.col("jaccard") >= threshold)


def simhash16(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, simhash int) 16-bit SimHash: bit b set iff the weighted
    majority of token md5-hashes has bit b set. 16 bits keeps the
    per-bit aggregation fully JVM-side AND DuckDB-reproducible."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), " "), lambda t: t != "")
    t = df.select(F.col(id_col).alias("id"), F.explode(toks).alias("tok"))
    # token hash: first 4 hex chars of md5 → 16-bit int (same in DuckDB)
    t = t.withColumn("th", F.conv(F.substring(F.md5("tok"), 1, 4), 16, 10).cast("long"))
    aggs = [
        F.sum(
            F.when(F.shiftright(F.col("th"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(16)
    ]
    s = t.groupBy("id").agg(*aggs)
    sim = None
    for b in range(16):
        bit = F.when(F.col(f"b{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sim = bit if sim is None else sim + bit
    return s.select("id", sim.cast("int").alias("simhash"))


def simhash_near_dups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", max_hamming: int = 2
) -> DataFrame:
    """(a, b, hamming) pairs with SimHash Hamming distance ≤ k.

    Blocking: four 4-bit bands of the 16-bit signature, self-equi-joined
    on (band_id, band_value). Pigeonhole: k differing bits touch at most
    k of the 4 bands, so for ``max_hamming ≤ 3`` at least one band is
    bit-identical and the pair is guaranteed to be a candidate
    (recall-complete). For k ≥ 4 the 4 bits can split 1+1+1+1 across all
    bands and the pair is missed — callers needing k ≥ 4 must widen the
    signature or the band count. The band join is a uniform-key
    equi-join (no OR-predicate cross join), so it scales like the
    MinHash LSH bucket join above.
    """
    return simhash_pairs(simhash16(df, text_col, id_col), max_hamming)


def simhash_pairs(s: DataFrame, max_hamming: int = 2) -> DataFrame:
    """Banded near-dup pairs over an (id, simhash) DataFrame — see
    :func:`simhash_near_dups` for the recall guarantee."""
    if max_hamming > 3:
        raise ValueError(
            "simhash_near_dups 4-band blocking is recall-complete only for "
            f"max_hamming <= 3 (got {max_hamming}); widen bands/signature instead"
        )
    bands = [
        s.select(
            "id",
            "simhash",
            F.lit(b).alias("band"),
            F.shiftright(F.col("simhash"), 4 * b).bitwiseAND(F.lit(0xF)).alias("bval"),
        )
        for b in range(4)
    ]
    banded = bands[0]
    for x in bands[1:]:
        banded = banded.unionByName(x)
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bval") == F.col("b.bval"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("a"), F.col("b.id").alias("b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .distinct()
    )
    return cand.filter(F.col("hamming") <= max_hamming)


def dedup_exact_stream(
    stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup: drop any row whose normalized-content
    fingerprint was already emitted, with the dedup state bounded by
    the event-time watermark (``dropDuplicatesWithinWatermark`` — the
    scale-correct form: an unbounded ``dropDuplicates`` state grows
    with the corpus forever). The batch tier is :func:`dedup_exact`;
    this is its continuous-ingest twin for training-data pipelines."""
    from okapi_spark.functions.text import fingerprint

    return (
        stream.withColumn("__fp", fingerprint(F.col(text_col)))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__fp"])
        .drop("__fp")
    )
