"""Spinner sql-vs-csr A/B at the production |V|·k ~ |E| group shape.

The round-5 Spinner csr scaling entry recorded a structural claim as
unmeasured: at the sandbox's default bench shape (|V| = |E|/5000, so
only ~768k distinct (dst, part) histogram groups) the sql plan's
`groupBy(dst, part)` hash agg fits in cache and is NOT the bottleneck,
while at the production shape (|V| ~ |E|/20, k in the hundreds) the
distinct-group count approaches |E| and the hash agg goes DRAM-random
— the regime the csr kernel's sort+segment-reduce is built for.

That shape IS reachable in-sandbox without blowing the csr state
broadcast gate: |V| = 3M at ~40B/row is 120MB (inside the 256MB
budget), and k = 128 with avg degree ~40 (after symmetrization) makes
the per-round histogram touch tens of millions of distinct groups.
This probe runs the identical Spinner job (threshold=0, fixed rounds)
in both modes at that shape on local[CORES] and reports per-round
walls — an absolute-cost A/B on one box, where DRAM-random vs
sequential access is exactly the thing a single chassis can measure.

Run: python scripts/spinner_shape_probe.py [n_edges] [n_vertices] [k] [rounds]
Appends the result table to BENCH.md.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

RUNNER = r"""
import json, statistics, sys, time
sys.path.insert(0, ".")
from okapi_spark.session import get_spark
from okapi_spark.sources.synth_graph import generate_edges
from okapi_spark.graph.graph import Graph

n_edges = int(sys.argv[1]); n_vertices = int(sys.argv[2])
k = int(sys.argv[3]); rounds = int(sys.argv[4]); mode = sys.argv[5]
cores = int(sys.argv[6])
spark = get_spark(cores=cores, shuffle_partitions=cores, app_name=f"spinshape-{mode}")
e = generate_edges(spark, n_edges, n_vertices=n_vertices)
g = Graph.from_edges(e, partitions=cores, cache=False)
m = g.num_edges()
spark.sparkContext._jvm.System.gc()
from okapi_spark.operators.lpa import spinner_partition
t0 = time.time()
res = spinner_partition(g, k=k, max_iterations=rounds, threshold=0.0,
                        num_partitions=cores, mode=mode)
res.state.count()
wall = time.time() - t0
times = [round(x["superstep_sec"], 3) for x in res.metrics_log]
measured = times[3:]
out = {"mode": mode, "edges": m, "k": k, "rounds": rounds,
       "wall_sec": round(wall, 2), "per_round_sec": times,
       "median_round_sec": round(statistics.median(measured), 3) if measured else None}
# distinct (dst, part) group census for the claim: how many histogram
# groups does one round actually touch at this shape
import pyspark.sql.functions as F
sym = g.symmetrize()
from pyspark.sql import functions as F2
parts = res.state.select("id", "part")
groups = (sym.edges.join(parts.withColumnRenamed("id", "src"), "src")
          .select("dst", "part").distinct().count())
out["distinct_hist_groups"] = groups
print(json.dumps(out))
spark.stop()
"""


def run(n_edges: int, n_vertices: int, k: int, rounds: int, mode: str, cores: int) -> dict:
    env = dict(os.environ, OKAPI_DRIVER_MEM=os.environ.get("OKAPI_DRIVER_MEM", "64g"))
    out = subprocess.run(
        [sys.executable, "-c", RUNNER, str(n_edges), str(n_vertices), str(k),
         str(rounds), mode, str(cores)],
        capture_output=True, text=True, cwd="/root/repo", timeout=3600, env=env,
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        sys.stderr.write(out.stdout[-3000:] + "\n" + out.stderr[-3000:] + "\n")
        raise RuntimeError(f"runner failed (mode={mode})")
    return json.loads(lines[-1])


def main() -> None:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000_000
    n_vertices = int(sys.argv[2]) if len(sys.argv) > 2 else 3_000_000
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    results = {}
    for mode in ("sql", "csr"):
        results[mode] = run(n_edges, n_vertices, k, rounds, mode, cores)
        print(json.dumps(results[mode], indent=2))
    sql, csr = results["sql"], results["csr"]
    ts = time.strftime("%Y-%m-%d %H:%M:%S")
    with open("/root/repo/BENCH.md", "a") as f:
        f.write(
            f"\n## Spinner shape probe {ts} (|E|={n_edges:,} directed, |V|={n_vertices:,}, "
            f"k={k}, {rounds} rounds, local[{cores}], threshold=0)\n\n"
            f"Distinct (dst, part) histogram groups actually touched per round: "
            f"{sql['distinct_hist_groups']:,} (the production |V|*k ~ |E| regime).\n\n"
            f"| mode | median round (s) | per-round walls |\n|---|---|---|\n"
            f"| sql  | {sql['median_round_sec']} | {sql['per_round_sec']} |\n"
            f"| csr  | {csr['median_round_sec']} | {csr['per_round_sec']} |\n"
        )


if __name__ == "__main__":
    main()
