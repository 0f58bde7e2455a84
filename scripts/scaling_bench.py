"""Scaling-efficiency evidence (north rule: ≥0.8 from N to 4N executors).

Sandbox proxy per BASELINE.md: identical job + input at local[8] and
local[32]. Job = PageRank, fixed supersteps, on a deterministic
synthetic power-law graph big enough that compute dominates scheduling.
Efficiency = (throughput@32 / throughput@8) / 4.

Writes/updates BENCH.md. Run: python scripts/scaling_bench.py [n_edges]
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

RUNNER = r"""
import json, sys, time
sys.path.insert(0, ".")
from okapi_spark.session import get_spark
from okapi_spark.sources.synth_graph import generate_edges
from okapi_spark.graph.graph import Graph
from okapi_spark.operators.pagerank import pagerank

cores = int(sys.argv[1]); n_edges = int(sys.argv[2]); iters = int(sys.argv[3])
state_broadcast = {"broadcast": True, "shuffle": False}.get(sys.argv[4] if len(sys.argv) > 4 else "auto")
spark = get_spark(cores=cores, shuffle_partitions=cores, app_name=f"scale{cores}")
e = generate_edges(spark, n_edges, n_vertices=max(1000, n_edges // 5000))
# cache=False: pagerank caches its own dst-partitioned `shares`; caching
# the raw edges too doubles resident data and thrashes at large E
g = Graph.from_edges(e, partitions=max(cores, 32), cache=False)
m = g.num_edges()
spark.sparkContext._jvm.System.gc()  # drain setup garbage before timing
# single run; per-superstep timing excludes the one-time shares build;
# the first 3 supersteps (JIT/codegen/GC warm) are dropped from the metric
t0 = time.time()
res = pagerank(g, iterations=iters, mode="sql", num_partitions=cores,
               state_broadcast=state_broadcast)
res.state.count()
wall = time.time() - t0
times = [round(x["superstep_sec"], 2) for x in res.metrics_log]
measured = times[3:]
ss_sec = sum(measured)
import statistics
med = statistics.median(measured)
print(json.dumps({"cores": cores, "edges": m, "iters": iters,
                  "wall_sec": round(wall, 2), "superstep_sec": round(ss_sec, 2),
                  "per_superstep_sec": times,
                  "measured_supersteps": len(measured),
                  "median_superstep_sec": round(med, 3),
                  "edges_per_sec_per_superstep": round(m * len(measured) / ss_sec, 1),
                  "edges_per_sec_median": round(m / med, 1)}))
spark.stop()
"""


def run(cores: int, n_edges: int, iters: int, plan: str = "auto") -> dict:
    import os

    env = dict(os.environ, OKAPI_DRIVER_MEM="80g")
    out = subprocess.run(
        [sys.executable, "-c", RUNNER, str(cores), str(n_edges), str(iters), plan],
        capture_output=True, text=True, cwd="/root/repo", timeout=3600, env=env,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 240_000_000
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    # plan: "auto" (broadcast below threshold), "broadcast", or
    # "shuffle" — the cluster-scale two-shuffle fallback that runs when
    # |V| no longer fits a broadcast; evidencing BOTH plans scale is
    # part of the scale story (the fallback is what executes at 10^10+
    # vertices)
    plan = sys.argv[3] if len(sys.argv) > 3 else "auto"
    lo = run(8, n_edges, iters, plan)
    hi = run(32, n_edges, iters, plan)
    eff = (hi["edges_per_sec_per_superstep"] / lo["edges_per_sec_per_superstep"]) / 4.0
    # median basis: robust to the multi-second G1 full-GC pauses that
    # randomly hit either side and make single-run sum-basis numbers
    # swing 0.4-2.8 across identical runs
    eff_med = (hi["edges_per_sec_median"] / lo["edges_per_sec_median"]) / 4.0
    result = {"local8": lo, "local32": hi,
              "scaling_efficiency_8_to_32": round(eff, 3),
              "scaling_efficiency_median": round(eff_med, 3),
              "ts": time.strftime("%Y-%m-%d %H:%M:%S")}
    print(json.dumps(result, indent=2))
    with open("/root/repo/BENCH.md", "a") as f:
        f.write(
            f"\n## Scaling run {result['ts']} (n_edges={n_edges:,}, pagerank x{iters}, plan={plan})\n\n"
            f"| parallelism | superstep wall (s) | median ss (s) | edges/sec/superstep (median basis) |\n|---|---|---|---|\n"
            f"| local[8]  | {lo['superstep_sec']} | {lo['median_superstep_sec']} | {lo['edges_per_sec_median']:,} |\n"
            f"| local[32] | {hi['superstep_sec']} | {hi['median_superstep_sec']} | {hi['edges_per_sec_median']:,} |\n\n"
            f"**Scaling efficiency (8→32 cores, ÷4): sum-basis {eff:.3f}, median-basis {eff_med:.3f}** (target ≥ 0.8)\n"
        )


if __name__ == "__main__":
    main()
