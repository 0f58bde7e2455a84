"""Hyperparameter registry — parity with the reference's reflection
metadata (cf/annotations/HyperParameter.java:36-43: parameterName /
description / defaultValue / minimumValue / maximumValue per tunable
field; cf/annotations/OkapiAutotuning.java marks sweepable models;
cf/annotations/AnnotationsInfo.java:83-110 emits the JSON the tuning
script consumes).

The reference declares the four ranking hyperparameters once on
AbstractCFRankingComputation (:65-75) and autotunes Random/BPR/TFMAP;
here every CF model registers its tunables with the same metadata
shape plus ``kwarg`` — the keyword argument of the corresponding
Python function — so a sweep driver can call the model directly
(scripts/ranking_experiment.py --sweep).
"""

from __future__ import annotations

from dataclasses import asdict, dataclass, field


@dataclass(frozen=True)
class HyperParameter:
    """One tunable — field names mirror HyperParameter.java:37-42."""

    parameter_name: str
    description: str
    default_value: float
    minimum_value: float
    maximum_value: float
    kwarg: str  # keyword argument on the registered callable


@dataclass(frozen=True)
class ModelInfo:
    name: str
    func: str  # "module:function" import path
    autotuning: bool  # @OkapiAutotuning present on the reference class
    hyper_parameters: tuple[HyperParameter, ...] = field(default_factory=tuple)


# The reference's shared ranking hyperparameters
# (AbstractCFRankingComputation.java:65-75), mapped to this engine's
# kwarg names.
_RANKING_PARAMS = (
    HyperParameter("dim", "dimensionality of the model", 10, 1, 1000, "vector_size"),
    HyperParameter("learnRate", "learning rate", 0.001, 0.0001, 10, "gamma"),
    HyperParameter("iter", "number of iterations", 10, 1, 1000, "iterations"),
    HyperParameter("reg", "regularizer", 0.01, 0.00011, 2, "lambda_"),
)

# Pop/Random take dim/iter only (no gradient); the reference still
# exposes all four through the shared abstract class — kept faithful.
REGISTRY: dict[str, ModelInfo] = {
    m.name: m
    for m in (
        ModelInfo("bpr", "okapi_spark.operators.ranking:bpr_ranking", True, _RANKING_PARAMS),
        ModelInfo("climf", "okapi_spark.operators.ranking:climf_ranking", False, _RANKING_PARAMS),
        ModelInfo("tfmap", "okapi_spark.operators.ranking:tfmap_ranking", True, _RANKING_PARAMS),
        ModelInfo("random", "okapi_spark.operators.ranking:random_ranking", True,
                  (_RANKING_PARAMS[0],)),
        ModelInfo("popularity", "okapi_spark.operators.ranking:popularity_ranking", False, ()),
        ModelInfo(
            "als", "okapi_spark.operators.cf:als", False,
            (
                HyperParameter("als.vector.size", "number of factors", 3, 1, 1000, "vector_size"),
                HyperParameter("als.lambda", "regularization", 0.01, 0.0001, 2, "lambda_"),
                HyperParameter("als.iterations", "iteration budget", 10, 1, 1000, "iterations"),
            ),
        ),
        ModelInfo(
            "sgd", "okapi_spark.operators.cf:sgd", False,
            (
                HyperParameter("sgd.vector.size", "number of factors", 3, 1, 1000, "vector_size"),
                HyperParameter("sgd.lambda", "regularization", 0.01, 0.0001, 2, "lambda_"),
                HyperParameter("sgd.gamma", "learning rate", 0.005, 0.0001, 10, "gamma"),
                HyperParameter("sgd.iterations", "iteration budget", 10, 1, 1000, "iterations"),
            ),
        ),
        ModelInfo(
            "svdpp", "okapi_spark.operators.svdpp:svdpp", False,
            (
                HyperParameter("svd.vector.size", "number of factors", 10, 1, 1000, "vector_size"),
                HyperParameter("svd.factor.gamma", "factor learning rate", 0.005, 0.0001, 10, "factor_gamma"),
                HyperParameter("svd.factor.lambda", "factor regularization", 0.01, 0.0001, 2, "factor_lambda"),
                HyperParameter("svd.bias.gamma", "bias learning rate", 0.005, 0.0001, 10, "bias_gamma"),
                HyperParameter("svd.bias.lambda", "bias regularization", 0.01, 0.0001, 2, "bias_lambda"),
                HyperParameter("svd.iterations", "iteration budget", 10, 1, 1000, "iterations"),
            ),
        ),
    )
}


def resolve(name: str):
    """Import and return the registered callable."""
    import importlib

    mod, fn = REGISTRY[name].func.split(":")
    return getattr(importlib.import_module(mod), fn)


def annotations_info() -> dict:
    """The AnnotationsInfo.getInfo() JSON shape (:83-110): one entry
    per registered model with its hyperparameter ranges — what an
    external autotuner consumes to build the search space."""
    return {
        "methods": [
            {
                "class": m.func,
                "autotuning": m.autotuning,
                "hyperParameters": [
                    {
                        "parameterName": p.parameter_name,
                        "description": p.description,
                        "defaultValue": p.default_value,
                        "minimumValue": p.minimum_value,
                        "maximumValue": p.maximum_value,
                        "kwarg": p.kwarg,
                    }
                    for p in m.hyper_parameters
                ],
            }
            for m in REGISTRY.values()
        ]
    }


def validate_grid(name: str, grid: dict[str, list[float]]) -> dict[str, list[float]]:
    """Map a {parameterName: values} grid to the callable's kwargs,
    range-checking each value against the declared bounds (the
    autotuner contract: out-of-range points are caller bugs)."""
    info = REGISTRY[name]
    by_name = {p.parameter_name: p for p in info.hyper_parameters}
    out: dict[str, list[float]] = {}
    for pname, values in grid.items():
        if pname not in by_name:
            raise KeyError(f"{name} has no hyperparameter {pname!r}; "
                           f"known: {sorted(by_name)}")
        p = by_name[pname]
        for v in values:
            if not (p.minimum_value <= v <= p.maximum_value):
                raise ValueError(
                    f"{pname}={v} outside [{p.minimum_value}, {p.maximum_value}]"
                )
        out[p.kwarg] = list(values)
    return out


def grid_points(grid: dict[str, list[float]]) -> list[dict[str, float]]:
    """Cartesian product of a kwarg grid, deterministic order."""
    import itertools

    keys = sorted(grid)
    return [dict(zip(keys, combo)) for combo in itertools.product(*(grid[k] for k in keys))]


def to_json(name: str | None = None) -> str:
    import json

    if name is None:
        return json.dumps(annotations_info(), indent=2)
    m = REGISTRY[name]
    return json.dumps({**asdict(m), "hyper_parameters": [asdict(p) for p in m.hyper_parameters]}, indent=2)
