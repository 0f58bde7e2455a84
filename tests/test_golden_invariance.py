"""Partitioning-invariance backing for the pinned-seed golden-snapshot
oracles (goldens/goldens_sf0.01.json, rendered as VALUES tables by
``__spark_entry__.oracle_sql``).

The snapshot is only a valid oracle if the query output is a pure
function of the input — independent of physical layout. These tests
run each golden-backed gate query at 8 and 32 shuffle partitions and
assert bitwise-identical rows, plus equality with the checked-in
snapshot itself; SVD++ additionally gets a factor-level invariance
check (the round-2 defect was item-step application order depending on
``monotonically_increasing_id``; steps are now ordered by originating
user id — svdpp.py item_kernel)."""

from __future__ import annotations

import json
import os
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
GOLDEN_PATH = os.path.join(ROOT, "goldens", "goldens_sf0.01.json")


def _run(spark, name: str, shuffle_partitions: int):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    try:
        df = entrymod.queries()[name](spark, SF_DIR)
        return sorted((tuple(r) for r in df.collect()), key=str)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


@pytest.mark.parametrize("name", entrymod._GOLDEN_NAMES)
def test_partition_invariance_and_golden(spark, name):
    rows8 = _run(spark, name, 8)
    rows32 = _run(spark, name, 32)
    assert rows8 == rows32, f"{name}: output depends on shuffle partitioning"
    with open(GOLDEN_PATH) as f:
        golden = json.load(f)[name]
    grows = sorted((tuple(r) for r in golden["rows"]), key=str)
    assert rows8 == grows, f"{name}: output drifted from the pinned golden"


def _toy_ratings(spark):
    return (
        spark.range(20).withColumnRenamed("id", "user")
        .crossJoin(spark.range(15).withColumnRenamed("id", "item"))
        .filter("(user + item) % 3 != 0")
        .selectExpr("user", "item", "CAST((user * 7 + item * 3) % 5 AS DOUBLE) AS rating")
    )


def test_svdpp_factors_partition_invariant(spark):
    from okapi_spark.operators.svdpp import svdpp

    ratings = _toy_ratings(spark)
    outs = []
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    for p in (4, 32):
        spark.conf.set("spark.sql.shuffle.partitions", str(p))
        try:
            uf, itf, _ = svdpp(ratings, vector_size=4, iterations=3)
            outs.append(
                (
                    sorted((tuple(r) for r in uf.collect()), key=str),
                    sorted((tuple(r) for r in itf.collect()), key=str),
                )
            )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert outs[0][0] == outs[1][0], "user factors depend on partitioning"
    assert outs[0][1] == outs[1][1], "item factors depend on partitioning"
