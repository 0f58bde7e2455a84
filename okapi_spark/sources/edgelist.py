"""Text edge-list I/O — parity with the reference's io/formats/*.

The reference ships 12 line-oriented edge input formats differing only
in id/value types, default weights, reversal, and zeroing
(io/formats/IntIntTextEdgeInputFormat.java:35 …
LongDoubleReverseTextEdgeInputFormat.java:37, SURVEY.md §2.e), plus
the bipartite CF format (cf/CfLongIdFloatTextInputFormat.java:36).
In Spark they collapse into one reader with options: every variant is
a projection/cast of ``split(line, sep)``.

Writers: adjacency-list and edge-list text sinks
(AdjacencyListNoValuesTextVertexOutputFormat.java:44,
LongDoubleTextEdgeOutputFormat.java:30) plus parquet as the real sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# reference separator class: [\001\t ] (Spinner.java:921, io formats)
DEFAULT_SEP = r"[\x01\t ]+"


def read_edge_list(
    spark: SparkSession,
    path: str,
    weighted: bool = True,
    default_weight: float = 1.0,
    zero_weights: bool = False,
    reverse: bool = False,
    sep: str = DEFAULT_SEP,
) -> DataFrame:
    """(src long, dst long, weight double) from ``src dst [w]`` lines.

    Option → reference format mapping:
      weighted=False              → LongNullTextEdgeInputFormat (w=default)
      zero_weights=True           → LongDoubleZerosTextEdgeInputFormat
      reverse=True                → LongDoubleReverseTextEdgeInputFormat
      int ids                     → IntInt*/IntDouble* (cast is lossless)
    """
    lines = spark.read.text(path)
    parts = F.split(F.trim(F.col("value")), sep)
    src = parts[0].cast("long")
    dst = parts[1].cast("long")
    if zero_weights:
        w = F.lit(0.0)
    elif weighted:
        # get() tolerates missing third field (ANSI mode errors on [2])
        w = F.coalesce(F.get(parts, 2).cast("double"), F.lit(default_weight))
    else:
        w = F.lit(default_weight)
    if reverse:
        src, dst = dst, src
    return (
        lines.filter(F.length(F.trim("value")) > 0)
        .select(src.alias("src"), dst.alias("dst"), w.alias("weight"))
    )


def read_ratings(
    spark: SparkSession, path: str, sep: str = DEFAULT_SEP
) -> DataFrame:
    """(user long, item long, rating double) from ``user item rating``
    lines — CfLongIdFloatTextInputFormat parity (users type 0, items
    type 1 become separate columns instead of typed ids)."""
    lines = spark.read.text(path)
    parts = F.split(F.trim(F.col("value")), sep)
    return lines.filter(F.length(F.trim("value")) > 0).select(
        parts[0].cast("long").alias("user"),
        parts[1].cast("long").alias("item"),
        parts[2].cast("double").alias("rating"),
    )


def read_points(spark: SparkSession, path: str, sep: str = DEFAULT_SEP) -> DataFrame:
    """(id long, features array<double>) from ``id c1,c2,...`` lines —
    KMeansTextInputFormat parity (clustering/kmeans/KMeansTextInputFormat.java:23)."""
    lines = spark.read.text(path)
    parts = F.split(F.trim(F.col("value")), sep)
    coords = F.transform(F.split(parts[1], ","), lambda x: x.cast("double"))
    return lines.filter(F.length(F.trim("value")) > 0).select(
        parts[0].cast("long").alias("id"), coords.alias("features")
    )


def read_vertex_values(spark: SparkSession, path: str, value_name: str = "part",
                       sep: str = DEFAULT_SEP) -> DataFrame:
    """(id long, <value_name> long) from ``id value`` lines —
    SpinnerVertexValueInputFormat parity (spinner/Spinner.java:919-954)."""
    lines = spark.read.text(path)
    parts = F.split(F.trim(F.col("value")), sep)
    return lines.filter(F.length(F.trim("value")) > 0).select(
        parts[0].cast("long").alias("id"), parts[1].cast("long").alias(value_name)
    )


def read_id_list(spark: SparkSession, path: str) -> DataFrame:
    """(id long) one id per line — SybilRank trusted-vertex list parity
    (graphs/SybilRank.java:321-350)."""
    return (
        spark.read.text(path)
        .filter(F.length(F.trim("value")) > 0)
        .select(F.trim("value").cast("long").alias("id"))
    )


def write_edge_list(edges: DataFrame, path: str, sep: str = "\t") -> None:
    """LongDoubleTextEdgeOutputFormat parity: one ``src dst w`` line per
    edge. The same physical line shape as the vertex-centric
    EdgesWithValuesVertexOutputFormat (io/formats/
    EdgesWithValuesVertexOutputFormat.java:30-46, configurable
    ``output.delimiter`` == ``sep``) — edge-table storage makes the
    two formats one writer."""
    edges.select(
        F.concat_ws(sep, F.col("src"), F.col("dst"), F.col("weight")).alias("value")
    ).write.mode("overwrite").text(path)


def write_adjacency_list(edges: DataFrame, path: str, sep: str = "\t") -> None:
    """AdjacencyListNoValuesTextVertexOutputFormat parity: one
    ``id nbr1 nbr2 ...`` line per vertex, neighbors sorted."""
    adj = edges.groupBy("src").agg(F.sort_array(F.collect_list("dst")).alias("nbrs"))
    adj.select(
        F.concat_ws(sep, F.col("src"), F.concat_ws(sep, F.transform("nbrs", lambda x: x.cast("string")))).alias("value")
    ).write.mode("overwrite").text(path)


def write_adjacency_list_with_values(
    vertex_values: DataFrame, edges: DataFrame, path: str, sep: str = "\t"
) -> None:
    """LongDoubleDoubleAdjacencyListTextVertexOutputFormat parity
    (io/formats/LongDoubleDoubleAdjacencyListTextVertexOutputFormat.java:22
    over Giraph's AdjacencyListTextVertexOutputFormat): one line per
    vertex ``id <sep> value <sep> dst1 <sep> w1 <sep> dst2 <sep> w2…``,
    neighbors sorted by id. ``vertex_values``: (id, value); vertices
    with no out-edges still write their (id, value) line."""
    adj = edges.groupBy(F.col("src").alias("id")).agg(
        F.array_sort(F.collect_list(F.struct("dst", "weight"))).alias("nbrs")
    )
    flat = F.flatten(
        F.transform(
            "nbrs", lambda s: F.array(s["dst"].cast("string"), s["weight"].cast("string"))
        )
    )
    (
        vertex_values.join(adj, "id", "left")
        .select(
            F.concat_ws(
                sep,
                F.col("id").cast("string"),
                F.col("value").cast("string"),
                F.coalesce(flat, F.array().cast("array<string>")),
            ).alias("value")
        )
        .write.mode("overwrite")
        .text(path)
    )


def read_adjacency_list_with_values(
    spark: SparkSession, path: str, sep: str = "\t"
) -> tuple[DataFrame, DataFrame]:
    """Inverse of :func:`write_adjacency_list_with_values` (the Giraph
    AdjacencyListTextVertexInputFormat line shape). Returns
    (vertex_values (id, value), edges (src, dst, weight))."""
    import re

    parts = F.split("value", re.escape(sep))
    lines = (
        spark.read.text(path)
        .filter(F.length(F.trim("value")) > 0)
        .select(parts.alias("p"))
        .persist()
    )
    vertex_values = lines.select(
        F.element_at("p", 1).cast("long").alias("id"),
        F.element_at("p", 2).cast("double").alias("value"),
    )
    # 1-based positions of dst tokens: 3, 5, 7, …
    idx = F.when(
        F.size("p") >= 4, F.sequence(F.lit(3), F.size("p") - 1, F.lit(2))
    ).otherwise(F.array().cast("array<int>"))
    edges = (
        lines.select(F.element_at("p", 1).cast("long").alias("src"), "p",
                     F.explode(idx).alias("i"))
        .select(
            "src",
            F.element_at("p", F.col("i")).cast("long").alias("dst"),
            F.element_at("p", F.col("i") + 1).cast("double").alias("weight"),
        )
    )
    return vertex_values, edges


def write_cf_model(user_factors: DataFrame, item_factors: DataFrame, path: str) -> None:
    """Trained-model text format of the reference's evaluation path
    (cf/eval/CfModelInputFormat.java:30-44, produced by runOkapi.py):
    one ``{id} {type}\\t[f1; f2; ...]`` line per vertex, type 0 = user,
    1 = item (CfLongId encoding, cf/CfLongId.java:29-53)."""

    def fmt(df: DataFrame, t: int) -> DataFrame:
        return df.select(
            F.concat(
                F.col("id").cast("string"),
                F.lit(f" {t}\t["),
                F.array_join(
                    F.transform("factors", lambda x: F.format_string("%.6f", x)), "; "
                ),
                F.lit("]"),
            ).alias("value")
        )

    fmt(user_factors, 0).unionAll(fmt(item_factors, 1)).write.mode("overwrite").text(path)


def read_cf_model(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """Inverse of ``write_cf_model``; returns (user_factors,
    item_factors), each (id long, factors array<double>) — feedable
    straight into the ranking evaluators (the reference's second-job
    model reload, bin/runOkapi.py:297-315)."""
    lines = spark.read.text(path).filter(F.length(F.trim("value")) > 0)
    id_type = F.split(F.split("value", "\t").getItem(0), " ")
    vec_str = F.regexp_replace(F.split("value", "\t").getItem(1), r"[\[\]]", "")
    # the reference splits on '\[|\]|,|;' (CfModelInputFormat.java:74) —
    # accept ';' AND ',' separators, drop empty segments, and fail
    # loudly on non-numeric factors instead of silently yielding nulls
    factors = F.filter(
        F.transform(F.split(vec_str, "[;,]"), lambda x: F.trim(x)),
        lambda x: F.length(x) > 0,
    )
    parsed = lines.select(
        id_type.getItem(0).cast("long").alias("id"),
        id_type.getItem(1).cast("int").alias("vtype"),
        F.transform(factors, lambda x: F.when(
            # try_cast nulls bad segments (ANSI-safe); assert_true then
            # raises OUR message instead of a bare NumberFormatException
            # (assert_true returns NULL when the check holds)
            F.assert_true(
                x.try_cast("double").isNotNull(),
                F.concat(F.lit("read_cf_model: non-numeric factor segment: "), x),
            ).isNull(),
            x.try_cast("double"),
        )).alias("factors"),
    )
    return (
        parsed.filter("vtype = 0").select("id", "factors"),
        parsed.filter("vtype = 1").select("id", "factors"),
    )
