"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship pipeline on the synthesized source-repo
corpus (BASELINE.json input_hint shape): generate documents →
co-commit edge induction → PageRank to 1e-6 → top ranks decoded.

``queries()`` / ``oracle_sql()`` — the operator suite exercised over a
co-purchase part graph induced from the sf testdata's ``lineitem``
(SQL-reproducible induction so DuckDB can oracle every operator,
including unrolled fixed-iteration PageRank/LPA/SSSP and a pruned
recursive-CTE connected components).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# flagship smoke
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Corpus → link graph → PageRank (converged) → top-20 hubs."""
    from okapi_spark.graph.induce import induce_edges, vertices_table
    from okapi_spark.operators.pagerank import pagerank
    from okapi_spark.sources.corpus import generate_documents

    docs = generate_documents(spark, sf=0.001).cache()
    g = induce_edges(docs)
    res = pagerank(g, tol=1e-6, max_supersteps=60)
    top = res.state.orderBy(F.desc("rank")).limit(20)
    return top.join(vertices_table(docs), "id").select("repo", "path", "rank")


# ---------------------------------------------------------------------------
# shared induction (Spark side)
# ---------------------------------------------------------------------------

def _graph(spark: SparkSession, sf_dir: str):
    from okapi_spark.graph.induce import copurchase_edges

    return copurchase_edges(spark, sf_dir)


# SQL prelude reproducing the same induction for DuckDB (views are
# pre-registered: lineitem etc.)
_EDGES_CTE = """
e0 AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
edges AS (
  SELECT src, dst FROM e0
  UNION ALL
  SELECT dst AS src, src AS dst FROM e0
),
verts AS (SELECT DISTINCT src AS id FROM edges),
deg AS (SELECT src AS id, COUNT(*) AS degree FROM edges GROUP BY src)
"""


# ---------------------------------------------------------------------------
# queries (Spark implementations)
# ---------------------------------------------------------------------------

def _q_degree(spark, sf_dir):
    g = _graph(spark, sf_dir)
    return g.out_degrees().select("id", F.col("out_deg").alias("degree"))


def _q_triangle_total(spark, sf_dir):
    from okapi_spark.operators.triangles import triangles_df

    g = _graph(spark, sf_dir)
    return triangles_df(g).agg(F.count("*").alias("n_triangles"))


def _q_triangle_per_vertex(spark, sf_dir):
    from okapi_spark.operators.triangles import triangle_count_per_vertex

    g = _graph(spark, sf_dir)
    return triangle_count_per_vertex(g)


def _q_connected_components(spark, sf_dir):
    from okapi_spark.operators.components import connected_components

    g = _graph(spark, sf_dir)
    return connected_components(g).state


def _q_pagerank10(spark, sf_dir):
    from okapi_spark.operators.pagerank import pagerank

    g = _graph(spark, sf_dir)
    res = pagerank(g, iterations=10)
    return res.state.select("id", F.round("rank", 9).alias("rank_r"))


def _q_lpa4(spark, sf_dir):
    from okapi_spark.operators.lpa import label_propagation

    g = _graph(spark, sf_dir)
    return label_propagation(g, iterations=4).state


def _q_sssp(spark, sf_dir):
    from okapi_spark.operators.sssp import sssp

    g = _graph(spark, sf_dir)
    src = g.edges.agg(F.min("src")).collect()[0][0]
    return sssp(g, int(src)).state


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "degree": _q_degree,
        "triangle_total": _q_triangle_total,
        "triangle_per_vertex": _q_triangle_per_vertex,
        "connected_components": _q_connected_components,
        "pagerank_10": _q_pagerank10,
        "lpa_4": _q_lpa4,
        "sssp_hops": _q_sssp,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

def _pagerank_sql(iters: int = 10) -> str:
    ctes = [
        "nv AS (SELECT COUNT(*) AS n FROM verts)",
        "r0 AS (SELECT id, 1.0/(SELECT n FROM nv) AS rank FROM verts)",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"""r{i} AS (
  SELECT v.id, 0.15/(SELECT n FROM nv) + 0.85*COALESCE(m.s, 0.0) AS rank
  FROM verts v LEFT JOIN (
    SELECT e.dst AS id, SUM(r.rank / d.degree) AS s
    FROM edges e JOIN r{i-1} r ON e.src = r.id JOIN deg d ON e.src = d.id
    GROUP BY e.dst
  ) m ON v.id = m.id
)"""
        )
    return (
        "WITH " + _EDGES_CTE + ", " + ",\n".join(ctes)
        + f"\nSELECT id, ROUND(rank, 9) AS rank_r FROM r{iters}"
    )


def _lpa_sql(iters: int = 4) -> str:
    ctes = ["l0 AS (SELECT id, id AS lbl FROM verts)"]
    for i in range(1, iters + 1):
        ctes.append(
            f"""h{i} AS (
  SELECT e.dst AS id, l.lbl, COUNT(*) AS w
  FROM edges e JOIN l{i-1} l ON e.src = l.id GROUP BY e.dst, l.lbl
),
b{i} AS (
  SELECT id, lbl FROM (
    SELECT id, lbl, ROW_NUMBER() OVER (PARTITION BY id ORDER BY w DESC, lbl ASC) AS rn
    FROM h{i}
  ) WHERE rn = 1
),
l{i} AS (
  SELECT p.id, COALESCE(b{i}.lbl, p.lbl) AS lbl
  FROM l{i-1} p LEFT JOIN b{i} ON p.id = b{i}.id
)"""
        )
    return "WITH " + _EDGES_CTE + ", " + ",\n".join(ctes) + f"\nSELECT id, lbl FROM l{iters}"


def _sssp_sql(iters: int = 6) -> str:
    ctes = ["d0 AS (SELECT (SELECT MIN(src) FROM edges) AS id, 0.0 AS dist)"]
    for i in range(1, iters + 1):
        ctes.append(
            f"""d{i} AS (
  SELECT id, MIN(dist) AS dist FROM (
    SELECT id, dist FROM d{i-1}
    UNION ALL
    SELECT e.dst AS id, d.dist + 1.0 AS dist FROM edges e JOIN d{i-1} d ON e.src = d.id
  ) GROUP BY id
)"""
        )
    return "WITH " + _EDGES_CTE + ", " + ",\n".join(ctes) + f"\nSELECT id, dist FROM d{iters}"


def oracle_sql() -> dict[str, str]:
    return {
        "degree": "WITH " + _EDGES_CTE + "\nSELECT id, degree FROM deg",
        "triangle_total": (
            "WITH " + _EDGES_CTE + """
SELECT COUNT(*) AS n_triangles
FROM e0 e1 JOIN e0 e2 ON e1.dst = e2.src JOIN e0 e3 ON e3.src = e1.src AND e3.dst = e2.dst"""
        ),
        "triangle_per_vertex": (
            "WITH " + _EDGES_CTE + """
SELECT e2.dst AS id, COUNT(*) AS triangles
FROM e0 e1 JOIN e0 e2 ON e1.dst = e2.src JOIN e0 e3 ON e3.src = e1.src AND e3.dst = e2.dst
GROUP BY e2.dst"""
        ),
        "connected_components": (
            "WITH RECURSIVE " + _EDGES_CTE + """,
cc(id, comp) AS (
  SELECT id, id FROM verts
  UNION
  SELECT e.dst, cc.comp FROM cc JOIN edges e ON e.src = cc.id AND cc.comp < e.dst
)
SELECT id, MIN(comp) AS comp FROM cc GROUP BY id"""
        ),
        "pagerank_10": _pagerank_sql(10),
        "lpa_4": _lpa_sql(4),
        "sssp_hops": _sssp_sql(6),
    }
