"""max_buffer caps for the sequential-fold CF kernels (SVD++/SGD).

VERDICT r3 "What's wrong #1": each user's full rating set is one
pandas group — a power user serialized one unbounded Python loop.
The cap keeps a deterministic hash-ordered sample per group (CLiMF/
TFMAP precedent, ranking.py _buffer_harness). These tests pin the
exact semantics: running with max_buffer=k must equal running
uncapped on the k-subset selected by the same (xxhash64, counterpart)
order — computed here independently via tests/ref_impl.py's
pure-Python XXH64, so the test does not share the engine's selection
code."""

from __future__ import annotations

import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ref_impl import spark_xxhash64  # noqa: E402


def _power_user_ratings(spark):
    """User 7 rates 120 items; 40 other users rate 3 items each."""
    rows = [(7, i, float((i * 13) % 5 + 1)) for i in range(1000, 1120)]
    for u in range(40):
        for j in range(3):
            rows.append((u, 1000 + (u * 7 + j * 11) % 120, float((u + j) % 5 + 1)))
    df = pd.DataFrame(rows, columns=["user", "item", "rating"]).drop_duplicates(["user", "item"])
    return spark.createDataFrame(df, schema="user long, item long, rating double")


def _truncate_by_hash(pdf: pd.DataFrame, group: str, other: str, k: int, seed: int) -> pd.DataFrame:
    """Independent recomputation of the cap's kept set."""
    pdf = pdf.copy()
    pdf["h"] = [
        spark_xxhash64(("long", int(g)), ("long", int(o)), ("int", seed))
        for g, o in zip(pdf[group], pdf[other])
    ]
    pdf = pdf.sort_values(["h", other], kind="stable")
    kept = pdf.groupby(group, group_keys=False).head(k)
    return kept.drop(columns="h").sort_values([group, other]).reset_index(drop=True)


def _collect_states(uf, itf):
    u = {int(r["id"]): (round(r["baseline"], 12) if "baseline" in r.asDict() else None,
                        tuple(round(x, 12) for x in r["factors"]))
         for r in uf.collect()}
    i = {int(r["id"]): (round(r["baseline"], 12) if "baseline" in r.asDict() else None,
                        tuple(round(x, 12) for x in r["factors"]))
         for r in itf.collect()}
    return u, i


def test_svdpp_cap_equals_uncapped_on_truncated_input(spark):
    from okapi_spark.operators.svdpp import svdpp

    full = _power_user_ratings(spark)
    capped_uf, capped_itf, _ = svdpp(full, vector_size=2, iterations=1, max_buffer=25, seed=42)

    pdf = full.toPandas()
    trunc = _truncate_by_hash(pdf, "user", "item", 25, seed=42)
    trunc_df = spark.createDataFrame(trunc, schema="user long, item long, rating double")
    want_uf, want_itf, _ = svdpp(trunc_df, vector_size=2, iterations=1, max_buffer=None, seed=42)

    got = _collect_states(capped_uf, capped_itf)
    want = _collect_states(want_uf, want_itf)
    assert got == want


def test_svdpp_cap_noop_below_threshold(spark):
    from okapi_spark.operators.svdpp import svdpp

    full = _power_user_ratings(spark)
    a_uf, a_itf, _ = svdpp(full, vector_size=2, iterations=1, max_buffer=10_000, seed=42)
    b_uf, b_itf, _ = svdpp(full, vector_size=2, iterations=1, max_buffer=None, seed=42)
    assert _collect_states(a_uf, a_itf) == _collect_states(b_uf, b_itf)


def test_sgd_cap_equals_uncapped_on_truncated_input(spark):
    """Items here have <= cap raters, so the item-side cap is identity
    and the user-side cap alone determines the kept set."""
    from okapi_spark.operators.cf import sgd

    full = _power_user_ratings(spark)
    capped_uf, capped_itf, _ = sgd(full, vector_size=2, iterations=2, max_buffer=25, seed=42)

    pdf = full.toPandas()
    trunc = _truncate_by_hash(pdf, "user", "item", 25, seed=42)
    # item-side groups: every item has at most 41 raters in the toy
    # data and the truncated set only shrinks them; cap of 25 on the
    # item side would NOT be identity, so verify the premise first.
    assert trunc.groupby("item").size().max() <= 25
    trunc_df = spark.createDataFrame(trunc, schema="user long, item long, rating double")
    want_uf, want_itf, _ = sgd(trunc_df, vector_size=2, iterations=2, max_buffer=None, seed=42)

    gu, gi = _collect_states(capped_uf, capped_itf)
    wu, wi = _collect_states(want_uf, want_itf)
    # RMSE is measured over the full set, so logs differ; states must
    # match for every group the two runs both train. Items whose every
    # rating was user-capped away exist only in the capped run (they
    # keep their init state there); all other states must be equal.
    assert gu == wu
    assert set(wi) <= set(gi)
    assert {k: gi[k] for k in wi} == wi
