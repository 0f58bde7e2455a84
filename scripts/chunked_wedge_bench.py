"""Chunked wedge-pass evidence (VERDICT r3 item 7).

``triangles(chunks=k)`` slices the pivot vertices into k hash classes
and runs the wedge join once per slice (ScalableSemimetric.java:67-113
megastep precedent), trading k passes over the oriented edge set for a
k-times-smaller in-flight wedge volume per join. Correctness
(chunked ≡ unchunked) is pinned by tests/test_triangles.py; this
script measures WHEN the trade pays: on a box where the single-pass
wedge set fits the shuffle budget it should cost ~k stage overheads,
and the win only appears in the spill-bound regime (wedge shuffle >
executor memory), which is the 10^12-edge cluster case.

Run: python scripts/chunked_wedge_bench.py [n_edges] [cores] [chunk_list]
Appends the measured table to BENCH.md.
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
from okapi_spark.operators.triangles import triangle_count
import pyspark.sql.functions as F

cores = int(sys.argv[1]); n_edges = int(sys.argv[2]); chunks = int(sys.argv[3])
spark = get_spark(cores=cores, shuffle_partitions=cores, app_name=f"chunks{chunks}")
e = generate_edges(spark, n_edges, n_vertices=n_edges // 10)
und = e.select("src", "dst").union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct()
e = und.select("src", "dst", F.lit(1.0).alias("weight"))
g = Graph.from_edges(e, partitions=max(cores, 32), cache=True, symmetric_distinct=True)
m = g.num_edges()
spark.sparkContext._jvm.System.gc()
n_tri = triangle_count(g, chunks=chunks)  # warm-up (JIT): untimed
walls = []
for _ in range(2):
    t0 = time.time()
    n_tri = triangle_count(g, chunks=chunks)
    walls.append(round(time.time() - t0, 2))
print(json.dumps({"chunks": chunks, "edges": m, "triangles": n_tri,
                  "wall_sec": min(walls), "walls": walls}))
spark.stop()
"""


def main() -> None:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    chunk_list = [int(c) for c in (sys.argv[3].split(",") if len(sys.argv) > 3 else ["1", "4"])]
    results = []
    for chunks in chunk_list:
        out = subprocess.run(
            [sys.executable, "-c", RUNNER, str(cores), str(n_edges), str(chunks)],
            capture_output=True, text=True, cwd="/root/repo", timeout=3600,
            env={**__import__("os").environ, "OKAPI_DRIVER_MEM": "48g"},
        )
        lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
        if not lines:
            sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-2000:] + "\n")
            raise RuntimeError(f"runner failed for chunks={chunks}")
        r = json.loads(lines[-1])
        results.append(r)
        print(json.dumps(r))
    assert len({r["triangles"] for r in results}) == 1, "chunked counts disagree!"
    ts = time.strftime("%Y-%m-%d %H:%M:%S")
    with open("/root/repo/BENCH.md", "a") as f:
        f.write(
            f"\n## Chunked wedge pass {ts} (n_edges={n_edges:,}, local[{cores}], "
            f"warm JVM, min-of-2)\n\n| chunks | wall (s) | all walls |\n|---|---|---|\n"
        )
        for r in results:
            f.write(f"| {r['chunks']} | {r['wall_sec']} | {r['walls']} |\n")
        base = results[0]["wall_sec"]
        f.write(
            f"\nIdentical triangle counts across all chunk settings "
            f"({results[0]['triangles']:,}). Overhead vs chunks={results[0]['chunks']}: "
            + ", ".join(f"chunks={r['chunks']} {r['wall_sec']/base:.2f}x" for r in results[1:])
            + ". In-memory regime: each extra chunk re-probes the cached oriented set "
            f"once more, so the expected cost is ~linear stage overhead; the knob pays "
            f"only when the single-pass wedge shuffle exceeds executor memory "
            f"(10^12-edge regime), where k passes bound in-flight wedge volume to 1/k.\n"
        )


if __name__ == "__main__":
    main()
