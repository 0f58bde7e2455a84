"""Explicit salted-key skew handling (north rule: "explicit salted-key
repartitioning for high-degree skew").

AQE's skew-join splitting covers sort-merge joins; these helpers cover
the two places AQE can't: aggregations keyed on hub vertices, and
broadcast-ineligible joins against a hub-keyed side. Pattern: explode
the hub side over ``salt`` shards + two-level aggregation (partial per
(key, salt), final per key) — the Giraph-era equivalent was Spinner's
prefix-hash partitioner spreading hot vertices
(spinner/PrefixHashPartitionerFactory.java:32-58).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_column(salts: int, *cols: str) -> Column:
    """Deterministic per-row salt in [0, salts) derived from row content
    — partitioning-independent, no RNG state."""
    return F.pmod(F.xxhash64(*cols, F.lit("salt")), F.lit(salts)).cast("int")


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, str],
    salts: int = 16,
) -> DataFrame:
    """Two-level aggregation for skewed keys: groupBy(key, salt) partial
    then groupBy(key) final. ``aggs``: {column: fn} with fn in
    sum/min/max/count (the decomposable ones)."""
    salted = df.withColumn("__salt", salt_column(salts, *[c for c in df.columns if c != key][:2] or [key]))
    partial_exprs, final_exprs = [], []
    for col, fn in aggs.items():
        out = f"{col}_{fn}"
        if fn == "count":
            partial_exprs.append(F.count("*").alias(out))
            final_exprs.append(F.sum(out).alias(out))
        elif fn in ("sum", "min", "max"):
            partial_exprs.append(getattr(F, fn)(col).alias(out))
            final_exprs.append(getattr(F, fn)(out).alias(out))
        else:
            raise ValueError(f"non-decomposable agg: {fn}")
    partial = salted.groupBy(key, "__salt").agg(*partial_exprs)
    return partial.groupBy(key).agg(*final_exprs)


def shard_count_expr(
    deg_col: Column | str,
    num_partitions: int,
    n_edges: int,
    target_min: int = 1024,
    cap_factor: int = 4,
) -> Column:
    """Per-vertex salt shard count for the degree-proportional salted
    edge layout (the cluster-scale shuffle fallback of the iterative
    operators): nsalt = clamp(1, cap_factor·P, ceil(out_deg/target))
    with target = max(target_min, |E|/(8P)). Hash-partitioning a
    power-law edge set by raw src puts a hub's entire edge list in ONE
    task — measured flat (skew-bound) from 8 to 32 cores; sharding
    each hub over nsalt (src, salt) keys rebalances it (BENCH.md
    round-2 shuffle-fallback analysis: 14.5s → 2.9s/superstep)."""
    target = max(target_min, n_edges // (num_partitions * 8))
    deg = F.col(deg_col) if isinstance(deg_col, str) else deg_col
    return F.greatest(
        F.lit(1),
        F.least(F.lit(cap_factor * num_partitions), F.ceil(deg / F.lit(target))),
    ).cast("int")


def explode_shards(state: DataFrame, id_as: str, *carry: str) -> DataFrame:
    """Explode a per-vertex state row over its own ``nsalt`` shard
    count → (id_as, *carry, salt). Tail vertices stay 1 row, hubs get
    a few — the exploded state is ~|V| + a handful of hub rows, so
    only that small side shuffles into the (src, salt) edge join."""
    return state.select(
        F.col("id").alias(id_as), *carry,
        F.explode(F.sequence(F.lit(0), F.col("nsalt") - 1)).alias("salt"),
    )


def hub_split(
    edges: DataFrame,
    degree_threshold: int = 100_000,
) -> tuple[DataFrame, DataFrame]:
    """Split an edge set into (hub_edges, tail_edges) by src degree —
    the census-driven routing used to give hub vertices their own
    plan (broadcast/salted) while the tail takes the default path."""
    deg = edges.groupBy("src").agg(F.count("*").alias("__d"))
    hubs = F.broadcast(deg.filter(F.col("__d") > degree_threshold).select("src"))
    hub_edges = edges.join(hubs, "src", "left_semi")
    tail_edges = edges.join(hubs, "src", "left_anti")
    return hub_edges, tail_edges
