"""Plan introspection helpers — used by tests to assert that the
physical plans are the ones we want at scale (pushdown reached the
scan, dims broadcast, no cartesian where an equi-join was intended).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def assert_in_plan(df: DataFrame, *needles: str) -> None:
    plan = formatted_plan(df)
    missing = [n for n in needles if n not in plan]
    assert not missing, f"plan missing {missing}:\n{plan}"


def assert_not_in_plan(df: DataFrame, *needles: str) -> None:
    plan = formatted_plan(df)
    present = [n for n in needles if n in plan]
    assert not present, f"plan unexpectedly contains {present}:\n{plan}"


def count_data_shuffles(plan: str) -> int:
    """Hash/range Exchange count in a formatted plan — the number of
    real data shuffles. Broadcast distribution is excluded (it moves a
    dim-sized table, not the data), and so is ReusedExchange (it reuses
    an already-counted exchange, performing no new shuffle). Formatted
    plans list each node in the tree AND in the details section, hence
    the halving. tools/dump_plans.py imports this — single source of
    the convention."""
    n_bcast = plan.count("BroadcastExchange") // 2
    n_reused = plan.count("ReusedExchange") // 2
    return plan.count("Exchange") // 2 - n_bcast - n_reused
