"""Record pinned-seed golden snapshots for the gate queries whose
semantics aren't SQL-expressible (SVD++ sequential fold, Spinner
migration protocol, semi-clustering set-valued state).

The snapshot is the exact output of the deterministic pinned-seed
query at the gate's scale factor, stored as JSON and rendered by
``__spark_entry__.oracle_sql()`` as a DuckDB VALUES table — turning
the driver's rows-only check into a hard value-hash check. Validity
rests on partitioning-invariance (tests/test_golden_invariance.py
asserts identical output at 8 vs 32 shuffle partitions) and on the
per-operator reference-golden unit tests.

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
        out[name] = {"sf_dir": sf_dir, "columns": df.columns, "rows": rows}
        print(f"{name}: {len(rows)} rows, cols={df.columns}")
    root = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "goldens")
    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, "goldens_sf0.01.json")
    with open(path, "w") as f:
        json.dump(out, f)
    print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
