"""Gate-at-scale spot check (VERDICT r4 "next round #7): the driver's
correctness gate only ever runs at sf0.01 (2,000 vertices), so
scale-dependent drift — integer overflow, skew-path divergence, a
broadcast/shuffle plan boundary crossed only at larger |V| — would be
invisible to it.  This slow test replays five oracle queries at sf0.1
(20,000 vertices / 2.39M edges) against DuckDB with the driver's own
comparison (sorted columns, 9dp float rounding, order-insensitive).

Query choice: degree, triangle_total, pagerank_10, lpa_4, kcore_80 —
the flagship aggregation/join/iteration/mutation shapes whose DuckDB
oracles stay tractable at this sf (measured 0.6-26s each).  The
connected-components recursive CTE and the jaccard wedge join are
oracle-infeasible at sf0.1 in DuckDB (the CTE accumulates O(|V|·reach)
pairs; the wedge join is ~1.1B rows), so their scale behavior is
covered by the operators' partition-invariance and plan-shape tests
instead.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
QUERIES = [
    "degree", "triangle_total", "triangle_total_csr", "pagerank_10",
    "lpa_4", "kcore_80",
]


def _normalize(rows, cols):
    """The driver-gate comparison: sort columns by name, round floats
    to 9dp, sort rows (scripts/check_contract.py)."""
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


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute("SET threads TO 8")
    for t in ["lineitem", "orders"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", QUERIES)
def test_gate_query_matches_oracle_at_sf01(spark, duck, name):
    sdf = entrymod.queries()[name](spark, SF_DIR)
    srows = _normalize([tuple(r) for r in sdf.collect()], sdf.columns)
    cur = duck.execute(entrymod.oracle_sql()[name])
    ocols = [d[0] for d in cur.description]
    orows = _normalize(cur.fetchall(), ocols)
    assert sorted(c.lower() for c in sdf.columns) == sorted(c.lower() for c in ocols)
    assert len(srows) == len(orows), f"{name}: {len(srows)} vs {len(orows)} rows"
    assert srows == orows, f"{name}: value mismatch at sf0.1"
