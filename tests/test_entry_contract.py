"""Driver-contract smoke tests: entry() produces rows with a stable
schema; every queries() entry runs at sf0.001; oracle_sql() keys are a
subset of queries() keys."""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

import pytest

spec = importlib.util.spec_from_file_location(
    "__spark_entry__", Path(__file__).resolve().parent.parent / "__spark_entry__.py"
)
entry_mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(entry_mod)


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) >= {"l_returnflag", "l_linestatus", "sum_qty", "count_order"}


def test_oracle_keys_subset_of_queries():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 50
    # the vast majority must be oracle-checked, not rows-only
    assert len(oracles) / len(qs) > 0.8


@pytest.mark.parametrize("name", sorted(entry_mod.queries()))
def test_query_runs_and_is_nonempty_schema(spark, sf_dir, name):
    df = entry_mod.queries()[name](spark, sf_dir)
    assert df.columns  # stable schema
    df.limit(1).collect()  # executable
