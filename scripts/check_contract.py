"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over
the same parquet tables, compare row count + schema + order-insensitive
values. Usage: python scripts/check_contract.py [sf_dir]"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import duckdb

import __spark_entry__ as entrymod
from okapi_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])  # optional: check just these query names
    spark = get_spark(app_name="contract_check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    if only:
        qs = {k: v for k, v in qs.items() if k in only}
    failures = 0
    for name, fn in qs.items():
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"{name:24s} rows={len(srows):8d} (rows-only, no oracle) {t_spark:6.1f}s")
            continue
        t0 = time.time()
        res = con.execute(oracles[name])
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        t_duck = time.time() - t0
        a, b = normalize(srows, scols), normalize(drows, dcols)
        ok_cols = sorted(scols) == sorted(dcols)
        ok = a == b and ok_cols
        status = "OK " if ok else "FAIL"
        print(f"{name:24s} {status} rows={len(a)}/{len(b)} cols={ok_cols} spark={t_spark:5.1f}s duck={t_duck:5.1f}s")
        if not ok:
            failures += 1
            if not ok_cols:
                print(f"   cols: spark={sorted(scols)} duck={sorted(dcols)}")
            diff = [(x, y) for x, y in zip(a, b) if x != y][:5]
            for x, y in diff:
                print(f"   spark={x}  duck={y}")
            only_a = set(map(str, a)) - set(map(str, b))
            only_b = set(map(str, b)) - set(map(str, a))
            for s in list(only_a)[:3]:
                print("   only-spark:", s)
            for s in list(only_b)[:3]:
                print("   only-duck:", s)
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
