"""Raw-shuffle scaling control (executor JVMs, same box).

LPA's shuffle-plan superstep is volume-bound: its dominant cost is
shuffling ~|E| (dst,label,weight) rows. On a single physical box,
every "executor JVM" shares one DRAM bus and one kernel page cache,
so the aggregate shuffle bandwidth available to the whole cluster is
roughly CONSTANT as executors are added — a shuffle-bound job cannot
scale linearly there no matter how the plan is written. This control
measures that ceiling directly: a bare `repartition(cores, dst)` of
the same 240M-row edge set followed by a cheap aggregate — no join,
no histogram, no label state, nothing the engine controls — timed
with the exact same protocol as the LPA scaling runs (warm-up
supersteps dropped, per-index minima across subprocess repeats).

If this bare shuffle's N→4N efficiency lands at ~the LPA number, the
LPA plan scales as well as the box's raw shuffle does, and the
residual vs the 0.8 target is the one-box measurement artifact, not
the plan. On a real cluster each node brings its own DRAM + NIC, so
aggregate shuffle bandwidth grows with N.

Run: python scripts/shuffle_control_bench.py [n_rows] [reps] [repeats]
Appends results to BENCH.md.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

RUNNER = r"""
import json, sys, time
sys.path.insert(0, ".")
from okapi_spark.session import get_spark
from okapi_spark.sources.synth_graph import generate_edges
import pyspark.sql.functions as F

cores = int(sys.argv[1]); n_rows = int(sys.argv[2]); reps = int(sys.argv[3])
mem_mb = 12288
workers = max(1, cores // 4)
spark = get_spark(cores=cores, shuffle_partitions=cores,
                  app_name=f"shufctl{cores}",
                  master=f"local-cluster[{workers},4,{mem_mb}]",
                  executor_mem=f"{mem_mb}m")
e = generate_edges(spark, n_rows, n_vertices=max(1000, n_rows // 5000))
e = e.repartition(max(cores, 32), "src").persist()
m = e.count()
spark.sparkContext._jvm.System.gc()

walls = []
for i in range(reps):
    t0 = time.time()
    # full-width |E|-row exchange on dst, then a cheap order-insensitive
    # digest so nothing is optimized away; partial agg runs AFTER the
    # explicit repartition, so all m rows cross the shuffle. bit_xor,
    # not sum: summing raw 64-bit hashes overflows under ANSI mode.
    row = (e.repartition(cores, "dst")
            .agg(F.expr("bit_xor(xxhash64(src, dst))").alias("h")).collect())
    walls.append(round(time.time() - t0, 2))
print(json.dumps({"cores": cores, "rows": m, "walls": walls}))
spark.stop()
"""


def robust(all_walls: list[list[float]]) -> float:
    n = min(len(w) for w in all_walls)
    if n <= 3:
        # warm supersteps 0-2 are normally dropped; with reps <= 3
        # nothing would remain and median([]) raises a bare
        # StatisticsError — fall back to the full wall list (ADVICE r4)
        mins = [min(w[i] for w in all_walls) for i in range(n)]
    else:
        mins = [min(w[i] for w in all_walls) for i in range(3, n)]
    return statistics.median(mins)


def side(cores: int, n_rows: int, reps: int, repeats: int) -> tuple[float, list[list[float]]]:
    runs = []
    for _ in range(repeats):
        out = subprocess.run(
            [sys.executable, "-c", RUNNER, str(cores), str(n_rows), str(reps)],
            capture_output=True, text=True, cwd="/root/repo", timeout=3600,
            env={**os.environ, "OKAPI_DRIVER_MEM": "8g"},
        )
        lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
        if not lines:
            sys.stderr.write(out.stdout[-3000:] + "\n" + out.stderr[-3000:] + "\n")
            raise RuntimeError(f"shuffle control runner failed (cores={cores})")
        runs.append(json.loads(lines[-1]))
        print(json.dumps(runs[-1]), flush=True)
    return robust([r["walls"] for r in runs]), [r["walls"] for r in runs]


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 240_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    lo, lo_walls = side(8, n_rows, reps, repeats)
    hi, hi_walls = side(32, n_rows, reps, repeats)
    eff = lo / (4 * hi)
    ts = time.strftime("%Y-%m-%d %H:%M:%S")
    with open("/root/repo/BENCH.md", "a") as f:
        f.write(
            f"\n## Raw-shuffle control {ts} (n_rows={n_rows:,}, bare repartition(dst)+digest, "
            f"mode=jvms, {reps} reps, min-per-index-of-{repeats} then median)\n\n"
            f"| parallelism | robust shuffle wall (s) | rows/sec |\n|---|---|---|\n"
            f"| local-cluster[2,4,12288] (2 executor JVMs) | {lo:.2f} | {n_rows / lo:,.0f} |\n"
            f"| local-cluster[8,4,12288] (8 executor JVMs) | {hi:.2f} | {n_rows / hi:,.0f} |\n\n"
            f"**Bare-shuffle scaling efficiency (÷4): {eff:.3f}** — the box's raw "
            f"shuffle ceiling with NOTHING of the engine in the loop (no join, no "
            f"histogram, no state). All walls — low: {lo_walls}, high: {hi_walls}\n"
        )
    print(json.dumps({"lo": lo, "hi": hi, "efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
