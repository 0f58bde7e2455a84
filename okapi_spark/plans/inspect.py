"""Physical-plan inspection helpers.

The engine's performance contract is structural: the per-superstep
message plan must contain ZERO shuffle exchanges in broadcast-state
mode, filters must reach the parquet scan, and joins against small
sides must be broadcast. These helpers make those properties
assertable in tests instead of hoped-for — by walking the actual
executed SparkPlan tree via py4j (text explain output interleaves
cached-relation build plans, which don't execute per job and must not
count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def _root(df: DataFrame):
    plan = df._jdf.queryExecution().executedPlan()
    if plan.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
        # initialPlan = after EnsureRequirements (exchanges inserted);
        # inputPlan would be BEFORE exchange insertion and lie to us
        plan = plan.initialPlan()
    return plan


def plan_node_names(df: DataFrame) -> list[str]:
    """Node names on the executing path, skipping the interiors of
    cached relations (built once, not per job) and broadcast sides
    (the intentionally-cheap path)."""
    out: list[str] = []

    def walk(node):
        name = node.nodeName()
        out.append(name)
        if "InMemoryTableScan" in name or "BroadcastExchange" in name:
            return
        if name == "BroadcastHashJoin":
            # descend only into the probe side (left for BuildRight)
            side = str(node.buildSide())
            probe = node.left() if "Right" in side else node.right()
            walk(probe)
            return
        for i in range(node.children().length()):
            walk(node.children().apply(i))

    walk(_root(df))
    return out


def count_exchanges(df: DataFrame) -> int:
    """Shuffle Exchange operators on the executing (probe) path."""
    return sum(
        1
        for n in plan_node_names(df)
        if "Exchange" in n and "BroadcastExchange" not in n
    )


def count_broadcast_joins(df: DataFrame) -> int:
    return sum(1 for n in plan_node_names(df) if n == "BroadcastHashJoin")


def has_pushed_filters(df: DataFrame) -> bool:
    plan = physical_plan(df)
    return "PushedFilters: [" in plan and "PushedFilters: []" not in plan
