"""Phase-level profiling harness for the optimization round (guide §1).

NOT the driver's bench — bench.py stays frozen. This script isolates
the expensive queries with the noop sink / phase timers so changes can
be attributed to plan work, not sinks or box noise. Usage:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench_extra.py [targets...]

targets: any of  pr_csr  tri_sql  tri_csr  pr_sql  lpa  cc  induce  (default all)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    targets = set(sys.argv[1:]) or {
        "pr_csr", "tri_sql", "tri_csr", "pr_sql", "lpa", "cc", "induce",
    }

    from okapi_spark.graph.induce import copurchase_edges
    from okapi_spark.session import get_spark

    spark = get_spark(cores=cpus, shuffle_partitions=cpus, app_name="okapi_bench_extra")
    sc = spark.sparkContext

    # warmup (same shape as bench.py)
    warm = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_orderkey", "l_partkey")
    small = warm.limit(1000)
    (
        warm.groupBy("l_orderkey").count()
        .join(F.broadcast(small.groupBy("l_orderkey").count().withColumnRenamed("count", "c2")), "l_orderkey")
        .agg(F.sum("count")).collect()
    )

    g = copurchase_edges(spark, sf_dir)
    m, nv = g.num_edges(), g.num_vertices()
    print(f"# graph |E|={m} |V|={nv}", flush=True)
    out: dict = {}

    def rep(name, fn):
        walls = []
        for _ in range(runs):
            sc.setJobDescription(name)
            t0 = time.time()
            extra = fn()
            walls.append(round(time.time() - t0, 3))
            sc.setJobDescription(None)
            if extra:
                print(f"  {name} {extra}", flush=True)
        out[name] = min(walls)
        print(f"{name}: min={min(walls)} walls={walls}", flush=True)

    if "induce" in targets:
        def f_induce():
            g2 = copurchase_edges(spark, sf_dir)
            g2.num_edges(); g2.num_vertices()
            g2.unpersist()
        rep("induce", f_induce)

    if "pr_sql" in targets:
        def f_pr_sql():
            from okapi_spark.operators.pagerank import pagerank
            r = pagerank(g, iterations=10, mode="sql")
            r.state.count()
            return {"ss_sec": [round(x["superstep_sec"], 3) for x in r.metrics_log]}
        rep("pr_sql", f_pr_sql)

    if "pr_csr" in targets:
        def f_pr_csr():
            from okapi_spark.operators.pagerank import pagerank
            r = pagerank(g, iterations=10, mode="csr")
            r.state.count()
            return {"ss_sec": [round(x["superstep_sec"], 3) for x in r.metrics_log]}
        rep("pr_csr", f_pr_csr)

    if "tri_sql" in targets:
        def f_tri_sql():
            from okapi_spark.operators.triangles import triangle_count
            n = triangle_count(g, mode="sql")
            return {"n": n}
        rep("tri_sql", f_tri_sql)

    if "tri_auto" in targets:
        def f_tri_auto():
            from okapi_spark.operators.triangles import triangle_count
            n = triangle_count(g)
            return {"n": n}
        rep("tri_auto", f_tri_auto)

    if "tri_csr" in targets:
        def f_tri_csr():
            from okapi_spark.operators.triangles import _triangle_count_csr
            n, phases = _triangle_count_csr(g)
            return {"n": n, **phases}
        rep("tri_csr", f_tri_csr)

    if "lpa" in targets:
        def f_lpa():
            from okapi_spark.operators.lpa import label_propagation
            r = label_propagation(g, iterations=4)
            r.state.count()
            return {"ss_sec": [round(x["superstep_sec"], 3) for x in r.metrics_log]}
        rep("lpa", f_lpa)

    if "cc" in targets:
        def f_cc():
            from okapi_spark.operators.components import connected_components
            r = connected_components(g)
            r.state.count()
            return {"ss_sec": [round(x["superstep_sec"], 3) for x in r.metrics_log]}
        rep("cc", f_cc)

    print(json.dumps({"metric": "bench_extra_sec", "queries": out, "n_edges": m, "n_vertices": nv}))
    spark.stop()


if __name__ == "__main__":
    main()
