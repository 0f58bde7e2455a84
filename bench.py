"""Benchmark harness — the driver runs this per-round.

Runs the headline graph suite on the co-purchase graph induced from
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) at
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Extra keys report the north-rule metric (edges processed/sec per
superstep for PageRank) and graph size, so scaling efficiency between
two parallelism levels can be computed by running this script twice
with different SPARK_GRAFT_CPUS (see scripts/scaling_bench.py).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else -1.0

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pyspark.sql import functions as F

    from okapi_spark.graph.induce import copurchase_edges
    from okapi_spark.operators.components import connected_components
    from okapi_spark.operators.lpa import label_propagation
    from okapi_spark.operators.pagerank import pagerank
    from okapi_spark.operators.triangles import triangle_count
    from okapi_spark.session import get_spark

    spark = get_spark(cores=cpus, shuffle_partitions=cpus, app_name="okapi_bench")

    queries: dict[str, float] = {}
    t_all = time.time()

    t0 = time.time()
    g = copurchase_edges(spark, sf_dir)
    n_edges = g.num_edges()
    n_vertices = g.num_vertices()
    queries["induce_edges"] = round(time.time() - t0, 3)

    t0 = time.time()
    pr = pagerank(g, tol=1e-6, max_supersteps=60, mode="sql")
    pr.state.count()
    queries["pagerank_converge"] = round(time.time() - t0, 3)
    pr_supersteps = pr.supersteps

    # fixed 10-iteration runs: superstep cost dominates → throughput signal
    t0 = time.time()
    pr10 = pagerank(g, iterations=10, mode="sql")
    pr10.state.count()
    queries["pagerank_10_sql"] = round(time.time() - t0, 3)
    sql_ss_sec = sum(m["superstep_sec"] for m in pr10.metrics_log)

    t0 = time.time()
    pr10c = pagerank(g, iterations=10, mode="csr")
    pr10c.state.count()
    queries["pagerank_10_csr"] = round(time.time() - t0, 3)
    csr_ss_sec = sum(m["superstep_sec"] for m in pr10c.metrics_log)

    t0 = time.time()
    cc = connected_components(g)
    cc.state.count()
    queries["connected_components"] = round(time.time() - t0, 3)

    t0 = time.time()
    queries["triangle_count"] = -1.0
    n_tri = triangle_count(g)
    queries["triangle_count"] = round(time.time() - t0, 3)

    t0 = time.time()
    lp = label_propagation(g, iterations=4)
    lp.state.count()
    queries["lpa_4"] = round(time.time() - t0, 3)

    total = round(time.time() - t_all, 3)
    # north-rule throughput: edges touched per superstep ÷ superstep wall
    eps_sql = n_edges * 10 / sql_ss_sec if sql_ss_sec else 0.0
    eps_csr = n_edges * 10 / csr_ss_sec if csr_ss_sec else 0.0

    print(
        json.dumps(
            {
                "metric": "graph_suite_sec",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "sf": sf,
                "cpus": cpus,
                "n_edges": n_edges,
                "n_vertices": n_vertices,
                "n_triangles": n_tri,
                "pagerank_supersteps": pr_supersteps,
                "edges_per_sec_per_superstep_sql": round(eps_sql, 1),
                "edges_per_sec_per_superstep_csr": round(eps_csr, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
