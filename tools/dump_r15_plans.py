"""Dump `.explain('formatted')` for every bench query (headline +
secondary) into plans/r15/<query>_<tag>.txt — the optimization round's
before/after evidence (spark_optimization_guide.md §1: capture plan
shape — Exchange count, join strategy, PushedFilters/ReadSchema,
codegen spans, Python-eval nodes — before touching anything).

Usage: python tools/dump_r15_plans.py <tag> [query ...]
  tag = "before" | "after"; default queries = HEADLINE + SECONDARY.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from bench import HEADLINE, SECONDARY  # noqa: E402
from ethiopia_legal_etl_spark.operators.registry import all_queries  # noqa: E402
from ethiopia_legal_etl_spark.plans.explain import formatted_plan  # noqa: E402
from ethiopia_legal_etl_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or (HEADLINE + SECONDARY)
    out_dir = REPO / "plans" / "r15"
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name="r15-plan-dump")
    qs = all_queries()
    for name in names:
        try:
            plan = formatted_plan(qs[name].builder(spark, SF_DIR))
        except Exception as e:  # eager builders that fail mid-dump
            plan = f"PLAN DUMP FAILED: {type(e).__name__}: {e}"
        (out_dir / f"{name}_{tag}.txt").write_text(plan)
        print(f"wrote {name}_{tag}.txt", flush=True)


if __name__ == "__main__":
    main()
