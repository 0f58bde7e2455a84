"""Corpus generator determinism + content-sha256 integrity invariant."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from okapi_spark.graph.induce import induce_edges, vertices_table
from okapi_spark.sources.corpus import (
    content_hashes,
    generate_documents,
    verify_content_integrity,
)


def test_schema_and_determinism(spark):
    d1 = generate_documents(spark, sf=0.001, seed=42)
    assert d1.columns == ["repo", "path", "commit", "lang", "content"]
    # localCheckpoint: works around a Spark 4.1.2 exceptAll planner bug
    # (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND) on deeply derived column trees
    d1 = d1.localCheckpoint()
    # identical regardless of partitioning (partitioning-independent hashes)
    d2 = generate_documents(spark, sf=0.001, seed=42, partitions=3).localCheckpoint()
    assert d1.exceptAll(d2).count() == 0 and d2.exceptAll(d1).count() == 0
    # different seed → different corpus
    d3 = generate_documents(spark, sf=0.001, seed=7).localCheckpoint()
    assert d1.exceptAll(d3).count() > 0


def test_content_sha256_integrity(spark):
    docs = generate_documents(spark, sf=0.001).cache()
    ledger = content_hashes(docs)
    assert verify_content_integrity(docs, ledger) == 0
    # independent oracle: hashlib over collected rows must equal sha2()
    sample = docs.limit(200).collect()
    engine = {
        (r.repo, r.path, r.commit): h
        for r, h in zip(
            sample,
            [hashlib.sha256(r.content.encode()).hexdigest() for r in sample],
        )
    }
    spark_side = {
        (r.repo, r.path, r.commit): r.h
        for r in docs.limit(200).select("repo", "path", "commit", F.sha2("content", 256).alias("h")).collect()
    }
    for k, v in engine.items():
        assert spark_side[k] == v


def test_edge_induction(spark):
    docs = generate_documents(spark, sf=0.001).cache()
    g = induce_edges(docs)
    e = g.edges
    assert e.columns == ["src", "dst", "weight"]
    assert g.num_edges() > 0
    # symmetric: every (s,d) has (d,s) with same weight
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    assert e.exceptAll(rev).count() == 0
    # no self loops
    assert e.filter(F.col("src") == F.col("dst")).count() == 0
    # vertex dictionary covers every endpoint
    vt = vertices_table(docs)
    missing = g.vertices().join(vt, "id", "left_anti").count()
    assert missing == 0
    # skew fixture present: top degree well above median
    degs = [r.out_deg for r in g.out_degrees().collect()]
    degs.sort()
    assert degs[-1] >= 5 * degs[len(degs) // 2]
