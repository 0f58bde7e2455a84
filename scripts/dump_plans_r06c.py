"""Dump the fused shortest-path / SybilRank one-job shapes (round-6
supplement #2; covers the gate-only csr operators fused this round).

Usage: python scripts/dump_plans_r06c.py
Writes plans/r06/{sssp_csr,sybilrank_csr}_{before,after}.txt.

"before" = the per-superstep csr scatter job that ran PER ROUND (it is
still the checkpointed / beyond-fuse-window path, so it can be dumped
from the live code); "after" = the fused loop's ONE job per call.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, ".")


def grab(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    outdir = os.path.join("plans", "r06")
    os.makedirs(outdir, exist_ok=True)

    from okapi_spark.graph.induce import copurchase_edges
    from okapi_spark.plans.csr_blocks import pid_frame
    from okapi_spark.session import get_spark

    spark = get_spark(app_name="dump_plans_r06c")
    P = spark.sparkContext.defaultParallelism
    g = copurchase_edges(spark, sf_dir)
    g.num_edges()

    def put(name: str, text: str) -> None:
        path = os.path.join(outdir, name)
        with open(path, "w") as f:
            f.write(text)
        print("wrote", path)

    def dummy(pdf_iter):
        for pdf in pdf_iter:
            yield pdf

    # per-superstep csr scatter (the before shape, one of 3 jobs/round:
    # this scatter + the full_outer merge/changed-count + the
    # localCheckpoint cache fill)
    put(
        "sssp_csr_before.txt",
        "# One relaxation superstep of the per-round csr loop (still the\n"
        "# checkpointed / beyond-fuse-window path): this scatter job plus\n"
        "# the full_outer merge + changed-count action plus a\n"
        "# localCheckpoint cache fill ran PER ROUND.\n"
        + grab(pid_frame(spark, P, 2).mapInPandas(dummy, schema="id long, cand double")),
    )
    put(
        "sssp_csr_after.txt",
        "# The fused loop's ONE Spark job per sssp()/mssp() call (round\n"
        "# 6): a P-row Range sliced to a single task feeding mapInPandas\n"
        "# — no Exchange, no join, no edge rescan; the kernel reads the\n"
        "# memoized staged blocks (shared between sssp and mssp) from\n"
        "# the OS page cache and iterates every round locally. (Kernel\n"
        "# body elided; shape identical.)\n"
        + grab(
            pid_frame(spark, P, 1).mapInPandas(
                dummy, schema="ids binary, dist binary, metrics binary"
            )
        ),
    )
    put(
        "sybilrank_csr_before.txt",
        "# One power iteration of the per-round csr loop (still the\n"
        "# beyond-fuse-window path): this scatter job plus the\n"
        "# vertices-join state update plus a localCheckpoint cache fill\n"
        "# ran PER ITERATION (ceil(log10 N) iterations).\n"
        + grab(pid_frame(spark, P, 2).mapInPandas(dummy, schema="dst long, msum double")),
    )
    put(
        "sybilrank_csr_after.txt",
        "# The fused loop's ONE Spark job per sybilrank() call (round 6):\n"
        "# PageRank's fused kernel with base=0, damping=1 over the\n"
        "# memoized trust-share blocks — all power iterations in one\n"
        "# task-local loop. (Kernel body elided; shape identical.)\n"
        + grab(
            pid_frame(spark, P, 1).mapInPandas(
                dummy, schema="ranks binary, metrics binary"
            )
        ),
    )
    spark.stop()


if __name__ == "__main__":
    main()
