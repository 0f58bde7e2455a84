"""spark-submit entrypoint (north rule: runs via ``spark-submit
--py-files okapi_spark.zip scripts/submit_job.py ...``).

Builds the corpus (or reads an existing documents table), induces the
link graph, runs the requested algorithm with a checkpoint store, and
writes results + lineage to the output directory.

Usage:
  spark-submit --py-files okapi_spark.zip scripts/submit_job.py \
      --algorithm pagerank --sf 0.01 --out /tmp/okapi_out \
      [--documents /path/to/documents.parquet] [--tol 1e-6] [--resume]

Package the zip with:  cd /root/repo && zip -r okapi_spark.zip okapi_spark
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--algorithm", default="pagerank",
                    choices=["pagerank", "components", "lpa", "triangles", "spinner"])
    ap.add_argument("--sf", type=float, default=0.001)
    ap.add_argument("--documents", default=None, help="existing documents parquet/Iceberg path")
    ap.add_argument("--out", required=True)
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--max-supersteps", type=int, default=100)
    ap.add_argument("--mode", default="sql", choices=["sql", "csr"])
    ap.add_argument("--k", type=int, default=8, help="labels for spinner")
    ap.add_argument("--resume", action="store_true",
                    help="continue from the checkpoint store under --out")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from okapi_spark.bsp import CheckpointStore
    from okapi_spark.graph.induce import induce_edges, vertices_table
    from okapi_spark.sources.corpus import content_hashes, generate_documents, verify_content_integrity

    spark = SparkSession.builder.appName(f"okapi_{args.algorithm}").getOrCreate()

    if args.documents:
        docs = spark.read.parquet(args.documents)
    else:
        docs = generate_documents(spark, sf=args.sf)
    docs = docs.cache()

    # north-rule per-row invariant: content sha256 equality at ingest
    mismatches = verify_content_integrity(docs, content_hashes(docs))
    if mismatches:
        raise SystemExit(f"content integrity violated: {mismatches} rows")

    g = induce_edges(docs)
    store = CheckpointStore(f"{args.out}/checkpoints/{args.algorithm}")
    if not args.resume:
        store.clear()

    if args.algorithm == "pagerank":
        from okapi_spark.operators.pagerank import pagerank

        res = pagerank(g, tol=args.tol, max_supersteps=args.max_supersteps,
                       mode=args.mode, store=store)
        out_df = res.state
    elif args.algorithm == "components":
        from okapi_spark.operators.components import connected_components

        res = connected_components(g, max_supersteps=args.max_supersteps,
                                   mode=args.mode, store=store)
        out_df = res.state
    elif args.algorithm == "lpa":
        from okapi_spark.operators.lpa import label_propagation

        res = label_propagation(g, max_supersteps=args.max_supersteps,
                                mode=args.mode, store=store)
        out_df = res.state
    elif args.algorithm == "spinner":
        from okapi_spark.operators.lpa import spinner_partition

        res = spinner_partition(g, k=args.k, max_iterations=args.max_supersteps,
                                mode=args.mode)
        out_df = res.state
    else:
        from okapi_spark.operators.triangles import triangle_count_per_vertex

        out_df = triangle_count_per_vertex(g)
        res = None

    decoded = out_df.join(vertices_table(docs), "id", "left")
    decoded.write.mode("overwrite").parquet(f"{args.out}/result.parquet")
    summary = {
        "algorithm": args.algorithm,
        "rows": decoded.count(),
        "supersteps": getattr(res, "supersteps", None),
        "converged": getattr(res, "converged", None),
        "metrics_log": getattr(res, "metrics_log", None),
    }
    with open(f"{args.out}/summary.json", "w") as f:
        json.dump(summary, f, indent=2, default=str)
    print(json.dumps({k: v for k, v in summary.items() if k != "metrics_log"}))
    spark.stop()


if __name__ == "__main__":
    main()
