"""Hyperparameter registry parity — the AnnotationsInfo-style listing
(cf/annotations/AnnotationsInfo.java:83-110) plus grid plumbing."""

from __future__ import annotations

import pytest

from okapi_spark.hyperparams import (
    REGISTRY,
    annotations_info,
    grid_points,
    resolve,
    validate_grid,
)


def test_annotations_info_shape():
    info = annotations_info()
    by_class = {m["class"]: m for m in info["methods"]}
    # the reference's shared ranking params on the BPR entry
    bpr = by_class["okapi_spark.operators.ranking:bpr_ranking"]
    names = {p["parameterName"] for p in bpr["hyperParameters"]}
    assert names == {"dim", "learnRate", "iter", "reg"}
    assert bpr["autotuning"] is True
    # defaults mirror AbstractCFRankingComputation.java:65-75
    defaults = {p["parameterName"]: p["defaultValue"] for p in bpr["hyperParameters"]}
    assert defaults == {"dim": 10, "learnRate": 0.001, "iter": 10, "reg": 0.01}
    # every registered model resolves to an importable callable whose
    # signature accepts every declared kwarg
    import inspect

    for m in REGISTRY.values():
        fn = resolve(m.name)
        params = inspect.signature(fn).parameters
        for hp in m.hyper_parameters:
            assert hp.kwarg in params, f"{m.name}: {hp.kwarg} not in {fn.__name__}"


def test_validate_grid_maps_and_bounds():
    g = validate_grid("bpr", {"learnRate": [0.01, 0.1], "reg": [0.01]})
    assert g == {"gamma": [0.01, 0.1], "lambda_": [0.01]}
    with pytest.raises(ValueError, match="outside"):
        validate_grid("bpr", {"learnRate": [100.0]})
    with pytest.raises(KeyError, match="no hyperparameter"):
        validate_grid("bpr", {"nope": [1.0]})


def test_grid_points_cartesian_deterministic():
    pts = grid_points({"a": [1, 2], "b": [3]})
    assert pts == [{"a": 1, "b": 3}, {"a": 2, "b": 3}]
