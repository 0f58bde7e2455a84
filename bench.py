"""Benchmark harness — the driver runs this per-round.

Runs the headline graph suite on the co-purchase graph induced from
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) at
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query runs ``$SPARK_GRAFT_BENCH_RUNS`` times (default 2) and the
MINIMUM is reported — this VM has noisy neighbors (identical queries
swing 2.8s..15.2s run-to-run), and min-of-N is the standard estimator
for the machine-limited cost under external noise. ``value`` is the
sum of the per-query minimums.

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


def _cpu_times() -> list[int] | None:
    """Aggregate jiffies from /proc/stat: user nice system idle iowait
    irq softirq steal."""
    try:
        with open("/proc/stat") as f:
            return [int(x) for x in f.readline().split()[1:9]]
    except (OSError, ValueError):
        return None


def _cpu_delta(a: list[int] | None, b: list[int] | None) -> dict | None:
    """Percent of elapsed CPU time spent in system / iowait / steal
    over a measurement window — the attribution channel for co-tenant
    noise (VERDICT r4 "next round #2": a wall inflated by hypervisor
    steal or kernel time shows up here, a plan regression doesn't)."""
    if a is None or b is None:
        return None
    d = [y - x for x, y in zip(a, b)]
    tot = sum(d) or 1
    return {
        "sys_pct": round(100.0 * d[2] / tot, 1),
        "iowait_pct": round(100.0 * d[4] / tot, 1),
        "steal_pct": round(100.0 * d[7] / tot, 1),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
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

    # warmup: exercise parquet scan, shuffle, broadcast join and
    # whole-stage codegen once so JIT/classloading noise stays out of
    # the timed queries
    warm = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_orderkey", "l_partkey")
    small = warm.limit(1000)
    (
        warm.groupBy("l_orderkey").count()
        .join(F.broadcast(small.groupBy("l_orderkey").count().withColumnRenamed("count", "c2")), "l_orderkey")
        .agg(F.sum("count")).collect()
    )

    state: dict = {}

    def q_induce():
        g = copurchase_edges(spark, sf_dir)
        state["n_edges"] = g.num_edges()
        state["n_vertices"] = g.num_vertices()
        if "g" in state:
            state["g"].unpersist()
        state["g"] = g

    def q_pagerank_converge():
        pr = pagerank(state["g"], tol=1e-6, max_supersteps=60, mode="sql")
        pr.state.count()
        state["pr_supersteps"] = pr.supersteps

    def q_pagerank_10_sql():
        pr10 = pagerank(state["g"], iterations=10, mode="sql")
        pr10.state.count()
        state["sql_ss_sec"] = sum(m["superstep_sec"] for m in pr10.metrics_log)

    def q_pagerank_10_csr():
        pr10c = pagerank(state["g"], iterations=10, mode="csr")
        pr10c.state.count()
        state["csr_ss_sec"] = sum(m["superstep_sec"] for m in pr10c.metrics_log)

    def q_cc():
        cc = connected_components(state["g"])
        cc.state.count()

    def q_triangles():
        state["n_tri"] = triangle_count(state["g"])

    def q_triangles_csr():
        n = triangle_count(state["g"], mode="csr")
        assert n == state["n_tri"], f"csr count {n} != sql count {state['n_tri']}"

    def q_lpa():
        lp = label_propagation(state["g"], iterations=4)
        lp.state.count()

    suite = [
        ("induce_edges", q_induce),
        ("pagerank_converge", q_pagerank_converge),
        ("pagerank_10_sql", q_pagerank_10_sql),
        ("pagerank_10_csr", q_pagerank_10_csr),
        ("connected_components", q_cc),
        ("triangle_count", q_triangles),
        ("triangle_count_csr", q_triangles_csr),
        ("lpa_4", q_lpa),
    ]

    queries: dict[str, float] = {}
    walls: dict[str, list[float]] = {}
    cpu_attr: dict[str, list[dict | None]] = {}
    best_aux: dict = {}
    for name, fn in suite:
        best = None
        walls[name] = []
        cpu_attr[name] = []
        for r in range(runs):
            c0 = _cpu_times()
            t0 = time.time()
            fn()
            dt = time.time() - t0
            cpu_attr[name].append(_cpu_delta(c0, _cpu_times()))
            walls[name].append(round(dt, 3))
            if best is None or dt < best:
                best = dt
                if name == "pagerank_10_sql":
                    best_aux["sql_ss_sec"] = state["sql_ss_sec"]
                if name == "pagerank_10_csr":
                    best_aux["csr_ss_sec"] = state["csr_ss_sec"]
        queries[name] = round(best, 3)

    total = round(sum(queries.values()), 3)
    n_edges = state["n_edges"]
    sql_ss_sec = best_aux.get("sql_ss_sec", 0.0)
    csr_ss_sec = best_aux.get("csr_ss_sec", 0.0)
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
                "runs_per_query": runs,
                "estimator": "min",
                # all walls per query: hypervisor-steal outliers are
                # visible at a glance, so a +10% min-of-N swing is
                # attributable to box noise vs a real regression
                "query_walls": walls,
                # per-run /proc/stat deltas (sys/iowait/steal % of the
                # window) — attributes wall outliers to box state
                "query_cpu": cpu_attr,
                "n_edges": n_edges,
                "n_vertices": state["n_vertices"],
                "n_triangles": state["n_tri"],
                "pagerank_supersteps": state["pr_supersteps"],
                "edges_per_sec_per_superstep_sql": round(eps_sql, 1),
                "edges_per_sec_per_superstep_csr": round(eps_csr, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
