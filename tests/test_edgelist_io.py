"""Edge-list text I/O round trips (io/formats parity)."""

from __future__ import annotations

from okapi_spark.sources.edgelist import (
    read_edge_list,
    read_ratings,
    write_adjacency_list,
    write_edge_list,
)


def test_read_variants(spark, tmp_path):
    p = tmp_path / "edges.txt"
    p.write_text("1 2 0.5\n2\t3\t1.5\n3 1\n")
    e = read_edge_list(spark, str(p))
    rows = {(r.src, r.dst): r.weight for r in e.collect()}
    assert rows == {(1, 2): 0.5, (2, 3): 1.5, (3, 1): 1.0}  # default weight fills
    z = read_edge_list(spark, str(p), zero_weights=True)
    assert {r.weight for r in z.collect()} == {0.0}
    r = read_edge_list(spark, str(p), reverse=True)
    assert {(x.src, x.dst) for x in r.collect()} == {(2, 1), (3, 2), (1, 3)}


def test_ratings_reader(spark, tmp_path):
    p = tmp_path / "ratings.txt"
    p.write_text("1 10 4.5\n2 10 3.0\n")
    df = read_ratings(spark, str(p))
    assert {(r.user, r.item, r.rating) for r in df.collect()} == {(1, 10, 4.5), (2, 10, 3.0)}


def test_write_round_trip(spark, tmp_path):
    p = tmp_path / "in.txt"
    p.write_text("1 2 0.5\n2 3 1.5\n")
    e = read_edge_list(spark, str(p))
    out = tmp_path / "out"
    write_edge_list(e, str(out))
    back = read_edge_list(spark, str(out), sep="\t")
    assert {(r.src, r.dst, r.weight) for r in back.collect()} == {
        (1, 2, 0.5), (2, 3, 1.5)
    }
    adj_out = tmp_path / "adj"
    write_adjacency_list(e, str(adj_out))
    lines = sorted(
        line for f in adj_out.glob("part-*") for line in f.read_text().splitlines()
    )
    assert lines == ["1\t2", "2\t3"]


def test_cf_model_round_trip(spark, tmp_path):
    from okapi_spark.sources.edgelist import read_cf_model, write_cf_model

    uf = spark.createDataFrame(
        [(32729, [0.883140, 0.126675]), (7563, [0.544951, 0.719476])],
        "id long, factors array<double>",
    )
    itf = spark.createDataFrame(
        [(5007, [0.726413, 0.968422]), (304, [0.368630, 0.468095])],
        "id long, factors array<double>",
    )
    path = str(tmp_path / "model")
    write_cf_model(uf, itf, path)
    # line format matches CfModelInputFormat.java:30-44 exactly
    raw = {r.value for r in spark.read.text(path).collect()}
    assert "32729 0\t[0.883140; 0.126675]" in raw
    assert "5007 1\t[0.726413; 0.968422]" in raw
    ru, ri = read_cf_model(spark, path)
    assert {(r.id, tuple(r.factors)) for r in ru.collect()} == {
        (32729, (0.883140, 0.126675)), (7563, (0.544951, 0.719476))
    }
    assert {(r.id, tuple(r.factors)) for r in ri.collect()} == {
        (5007, (0.726413, 0.968422)), (304, (0.368630, 0.468095))
    }


def test_adjacency_with_values_roundtrip(spark, tmp_path):
    """write_adjacency_list_with_values ∘ read_adjacency_list_with_values
    is identity (LongDoubleDoubleAdjacencyListTextVertexOutputFormat
    line shape), including a vertex with no out-edges."""
    from okapi_spark.sources.edgelist import (
        read_adjacency_list_with_values,
        write_adjacency_list_with_values,
    )

    vv = spark.createDataFrame(
        [(1, 0.5), (2, 1.25), (3, -2.0), (9, 7.0)], "id long, value double"
    )
    edges = spark.createDataFrame(
        [(1, 2, 1.0), (1, 3, 2.5), (2, 3, 0.75), (3, 1, 4.0)],
        "src long, dst long, weight double",
    )
    path = str(tmp_path / "adjv")
    write_adjacency_list_with_values(vv, edges, path)
    rvv, redges = read_adjacency_list_with_values(spark, path)
    assert sorted(map(tuple, rvv.collect())) == sorted(map(tuple, vv.collect()))
    assert sorted(map(tuple, redges.collect())) == sorted(map(tuple, edges.collect()))


def test_cf_model_reader_accepts_comma_separators(spark, tmp_path):
    """The reference parser splits factors on '[;,]'
    (CfModelInputFormat.java:74); a comma-separated model file must
    parse to the same factors, and non-numeric segments must raise
    rather than silently yield nulls."""
    import pytest as _pytest

    from okapi_spark.sources.edgelist import read_cf_model

    p = tmp_path / "model"
    p.mkdir()
    (p / "part-0").write_text("7 0\t[0.5; 1.5]\n8 1\t[2.5, 3.5]\n")
    uf, itf = read_cf_model(spark, str(p))
    assert [tuple(r) for r in uf.collect()] == [(7, [0.5, 1.5])]
    assert [tuple(r) for r in itf.collect()] == [(8, [2.5, 3.5])]

    bad = tmp_path / "bad"
    bad.mkdir()
    (bad / "part-0").write_text("7 0\t[0.5; oops]\n")
    uf2, _ = read_cf_model(spark, str(bad))
    with _pytest.raises(Exception, match="non-numeric"):
        uf2.collect()
