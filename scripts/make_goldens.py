"""Record pinned-seed golden snapshots for the gate queries whose
semantics aren't SQL-expressible (SVD++ sequential fold, Spinner
migration protocol, semi-clustering set-valued state).

The snapshot is the exact output of the deterministic pinned-seed
query at the gate's scale factor, stored as JSON and rendered by
``__spark_entry__.oracle_sql()`` as a DuckDB VALUES table — turning
the driver's rows-only check into a hard value-hash check. Validity
rests on three legs: (1) partitioning-invariance
(tests/test_golden_invariance.py asserts identical output at 8 vs 32
shuffle partitions), (2) the per-operator reference-golden unit
tests, and (3) — the non-circular leg — an INDEPENDENT sequential
recomputation (tests/ref_impl.py, pure Python/NumPy written from the
reference Java semantics): this script VERIFIES the engine output
against that recomputation and refuses to record a snapshot that
disagrees, so an engine bug cannot be baked into a golden.

Usage: python scripts/make_goldens.py [sf_dir]   (default sf0.01 —
the sf the driver's correctness gate runs at)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from okapi_spark.session import get_spark

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import ref_impl  # noqa: E402


def _verify_independent(name: str, rows: list, sf_dir: str) -> None:
    """Raise if the engine output disagrees with the pure-Python
    reference-semantics rerun (tests/ref_impl.py). Rounded columns get
    one ulp-at-the-rounded-digit of slack (engine/oracle may differ by
    float-summation order below 1e-9)."""
    if name == "spinner_8":
        want = ref_impl.ref_spinner(
            ref_impl.weighted_copurchase_edges(sf_dir), k=8, max_iterations=8, seed=5
        )
        got = {int(r[0]): int(r[1]) for r in rows}
        bad = {v: (got.get(v), want[v]) for v in want if got.get(v) != want[v]}
        if bad or len(got) != len(want):
            raise SystemExit(f"REFUSING golden {name}: {len(bad)} label mismatches, e.g. {list(bad.items())[:5]}")
    elif name == "svdpp_1":
        _, items = ref_impl.ref_svdpp(ref_impl.ratings_table(sf_dir), vector_size=3, iterations=1)
        got = {int(r[0]): float(r[1]) for r in rows}
        bad = {
            i: (got.get(i), round(st[0], 6))
            for i, st in items.items()
            if got.get(i) is None or abs(got[i] - round(st[0], 6)) > 1.01e-6
        }
        if bad or len(got) != len(items):
            raise SystemExit(f"REFUSING golden {name}: {len(bad)} baseline mismatches, e.g. {list(bad.items())[:5]}")
    elif name == "semicluster_2":
        want = ref_impl.ref_semiclustering(
            ref_impl.weighted_copurchase_edges(sf_dir), iterations=2
        )
        got = {int(r[0]): (int(r[1]), float(r[2])) for r in rows}
        bad = {}
        for v, clusters in want.items():
            w = (len(clusters), round(clusters[0][3], 6))
            g = got.get(v)
            if g is None or g[0] != w[0] or abs(g[1] - w[1]) > 1.01e-6:
                bad[v] = (g, w)
        if bad or len(got) != len(want):
            raise SystemExit(f"REFUSING golden {name}: {len(bad)} cluster mismatches, e.g. {list(bad.items())[:5]}")
    elif name == "jaccard_minhash":
        want = ref_impl.ref_jaccard_minhash(sf_dir, num_hashes=16)
        got = {int(r[0]): (int(r[1]), int(r[2])) for r in rows}
        bad = {v: (got.get(v), want[v]) for v in want if got.get(v) != want[v]}
        if bad or len(got) != len(want):
            raise SystemExit(f"REFUSING golden {name}: {len(bad)} sketch mismatches, e.g. {list(bad.items())[:5]}")
    elif name == "random_rank":
        _, items = ref_impl.ref_random_ranking(ref_impl.ratings_table(sf_dir), vector_size=4)
        _check_factor_rows(name, rows, items, n_dims=4, tol=1e-12)
    elif name in ("sgd_2", "bpr_2", "climf_2", "tfmap_2"):
        ratings = ref_impl.ratings_table(sf_dir)
        fn = {
            "sgd_2": lambda: ref_impl.ref_sgd(ratings, vector_size=2, iterations=2),
            "bpr_2": lambda: ref_impl.ref_bpr(ratings, vector_size=2, iterations=2),
            "climf_2": lambda: ref_impl.ref_climf(ratings, vector_size=2, iterations=2),
            "tfmap_2": lambda: ref_impl.ref_tfmap(ratings, vector_size=2, iterations=2),
        }[name]
        _, items = fn()
        # gate rows are 6dp-rounded; 1.01e-6 absorbs the <1e-12
        # engine-vs-sequential summation-order drift (svdpp precedent)
        _check_factor_rows(name, rows, {i: [round(v[0], 6), round(v[1], 6)] for i, v in items.items()},
                           n_dims=2, tol=1.01e-6)


def _check_factor_rows(name: str, rows: list, want: dict, n_dims: int, tol: float) -> None:
    got = {int(r[0]): [float(x) for x in r[1:1 + n_dims]] for r in rows}
    bad = {}
    for i, vec in want.items():
        g = got.get(i)
        if g is None or any(abs(g[d] - float(vec[d])) > tol for d in range(n_dims)):
            bad[i] = (g, list(vec))
    if bad or len(got) != len(want):
        raise SystemExit(f"REFUSING golden {name}: {len(bad)} factor mismatches, e.g. {list(bad.items())[:5]}")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="make_goldens")
    out = {}
    for name in entrymod._GOLDEN_NAMES:
        df = entrymod.queries()[name](spark, sf_dir)
        rows = sorted(
            ([None if v is None else v for v in r] for r in df.collect()),
            key=lambda r: tuple(str(x) for x in r),
        )
        _verify_independent(name, rows, sf_dir)
        out[name] = {"sf_dir": sf_dir, "columns": df.columns, "rows": rows}
        print(f"{name}: {len(rows)} rows, cols={df.columns} (independent check OK)")
    root = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "goldens")
    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, "goldens_sf0.01.json")
    with open(path, "w") as f:
        json.dump(out, f)
    print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
