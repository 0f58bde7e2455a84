"""Salted aggregation correctness + hub split."""

from __future__ import annotations

from pyspark.sql import functions as F

from okapi_spark.plans.skew import hub_split, salted_agg
from okapi_spark.sources.synth_graph import generate_edges


def test_salted_agg_matches_plain(spark):
    e = generate_edges(spark, 100_000, 500, zipf_alpha=1.4)  # heavy hub skew
    plain = {
        (r.src): (r.w, r.c)
        for r in e.groupBy("src")
        .agg(F.sum("weight").alias("w"), F.count("*").alias("c"))
        .collect()
    }
    salted = {
        (r.src): (r.weight_sum, r.weight_count)
        for r in salted_agg(e, "src", {"weight": "sum"}, salts=8)
        .join(
            salted_agg(e.select("src", F.col("weight").alias("weight")), "src", {"weight": "count"}, salts=8)
            .withColumnRenamed("weight_count", "weight_count"),
            "src",
        )
        .collect()
    }
    assert set(plain) == set(salted)
    for k in plain:
        assert abs(plain[k][0] - salted[k][0]) < 1e-9
        assert plain[k][1] == salted[k][1]


def test_hub_split(spark):
    e = generate_edges(spark, 100_000, 500, zipf_alpha=1.4)
    hub, tail = hub_split(e, degree_threshold=1_000)
    n_hub, n_tail = hub.count(), tail.count()
    assert n_hub + n_tail == e.count()
    assert n_hub > 0  # zipf guarantees hubs at this threshold
    # no tail src exceeds the threshold
    max_tail_deg = tail.groupBy("src").count().agg(F.max("count")).collect()[0][0]
    assert max_tail_deg <= 1_000
