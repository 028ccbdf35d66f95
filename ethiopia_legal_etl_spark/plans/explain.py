"""Plan introspection helpers — used by tests to assert that the
physical plans are the ones we want at scale (pushdown reached the
scan, dims broadcast, no cartesian where an equi-join was intended).
"""

from __future__ import annotations

import re

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


# detail-section header of a physical node, e.g. "(15) Exchange";
# matching headers (not substring counts) makes the count structural:
# each node is counted exactly once, independent of how many times its
# name appears as a substring in the tree section.
_EXCHANGE_HEADER = re.compile(
    r"^\((\d+)\) (Exchange|BroadcastExchange|ReusedExchange)\b", re.M
)


def count_data_shuffles(plan: str) -> int:
    """Hash/range Exchange count in a formatted plan — the number of
    real data shuffles. Broadcast distribution is excluded (it moves a
    dim-sized table, not the data), and so is ReusedExchange (it reuses
    an already-counted exchange, performing no new shuffle). Counted
    structurally from the detail-section headers. Once an AQE plan has
    executed (isFinalPlan=true) the print carries an '== Initial Plan
    ==' section whose nodes get their own ids in the details — those
    ids are excluded so only the final plan is counted.
    tools/dump_plans.py imports this — single source of the
    convention."""
    exclude: set[str] = set()
    # one "== Initial Plan ==" section appears PER AdaptiveSparkPlan in
    # an executed print (main plan + each subquery subtree), so every
    # occurrence must be harvested; each tree segment ends at the first
    # blank line, and every "(N)" in it is an initial-plan node id
    for seg in plan.split("== Initial Plan ==")[1:]:
        tree = seg.split("\n\n", 1)[0]
        exclude.update(re.findall(r"\((\d+)\)", tree))
    seen: dict[str, str] = {}
    for nid, kind in _EXCHANGE_HEADER.findall(plan):
        if nid not in exclude:
            seen[nid] = kind
    return sum(1 for kind in seen.values() if kind == "Exchange")


def _initial_plan_node_ids(plan: str) -> set[str]:
    exclude: set[str] = set()
    for seg in plan.split("== Initial Plan ==")[1:]:
        tree = seg.split("\n\n", 1)[0]
        exclude.update(re.findall(r"\((\d+)\)", tree))
    return exclude


def count_single_partition_exchanges(plan: str) -> int:
    """Structural count of `Exchange SinglePartition` nodes — the
    one-reducer funnels a 100 TB plan cannot afford on corpus-grain
    data. A global window (Window.orderBy with no partition key)
    plans exactly this; so does a final single-partition sort-merge.
    Detection is on the detail blocks ('(N) Exchange' whose Arguments
    carry SinglePartition), with the same executed-AQE Initial-Plan
    exclusion as count_data_shuffles, so the number is a stable
    plan property, not a substring count. The per-entry budget gate
    (tests/test_plans.py) pins every nonzero count to a justified
    BOUNDED input (post-aggregate tables, 1-row totals) — replacing
    the comment-grep convention with plan-level enforcement."""
    exclude = _initial_plan_node_ids(plan)
    # Block end is anchored on the NEXT node header (or end-of-string),
    # not on a blank line: a detail block that terminates the plan
    # string without a trailing blank line must still be inspected
    # (the old blank-line regex silently skipped it — an under-count
    # that let the SP_BUDGET gate pass instead of flag).
    blocks: dict[str, tuple[str, str]] = {}
    for m in re.finditer(
        r"^\((\d+)\) (Exchange|ReusedExchange)\b(.*?)(?=^\(\d+\) |\Z)",
        plan,
        re.M | re.S,
    ):
        blocks[m.group(1)] = (m.group(2), m.group(3))
    sp_ids = {
        nid
        for nid, (kind, body) in blocks.items()
        if kind == "Exchange" and "SinglePartition" in body
    }
    count = sum(1 for nid in sp_ids if nid not in exclude)
    # A ReusedExchange whose target is a SinglePartition exchange is a
    # second consumer of the same one-reducer funnel — resolve the
    # `Reuses operator id` reference and count it too (ReusedExchange
    # detail blocks never print the partitioning themselves).
    for nid, (kind, body) in blocks.items():
        if kind != "ReusedExchange" or nid in exclude:
            continue
        ref = re.search(r"Reuses operator id: (\d+)", body)
        if ref and ref.group(1) in sp_ids:
            count += 1
    return count
