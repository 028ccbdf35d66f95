"""Dynamic partition pruning evidence: a fact table partitioned on the
join key is pruned at RUNTIME by the dim side's filter — the scan
carries `dynamicpruningexpression(... IN dynamicpruning#N)` in its
PartitionFilters, so at 100 TB the fact scan reads only the partitions
the filtered dimension selects, without any literal partition
predicate in the query text."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from ethiopia_legal_etl_spark.sources.tables import load_table


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def partitioned_orders(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("dpp") / "orders_by_priority")
    load_table(spark, sf_dir, "orders").write.mode("overwrite").partitionBy(
        "o_orderpriority"
    ).parquet(path)
    return path


def _dpp_query(spark, fact_path):
    fact = spark.read.parquet(fact_path)
    dim = spark.createDataFrame(
        [("1-URGENT", "fast"), ("2-HIGH", "fast"), ("5-LOW", "slow")],
        "o_orderpriority string, speed string",
    ).where(F.col("speed") == "fast")
    return (
        fact.join(dim, "o_orderpriority")
        .groupBy("speed")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def test_fact_scan_carries_dynamic_pruning_filter(spark, partitioned_orders):
    plan = _plan(_dpp_query(spark, partitioned_orders))
    assert "dynamicpruningexpression" in plan.lower()
    # the pruning expression sits on the fact scan's PartitionFilters
    dpp_lines = [
        line
        for line in plan.splitlines()
        if "PartitionFilters" in line and "dynamicpruning" in line.lower()
    ]
    assert dpp_lines, plan


def test_dpp_result_matches_undynamic_run(spark, partitioned_orders):
    want = sorted(map(tuple, _dpp_query(spark, partitioned_orders).collect()))
    conf = "spark.sql.optimizer.dynamicPartitionPruning.enabled"
    saved = spark.conf.get(conf)
    try:
        spark.conf.set(conf, "false")
        plan = _plan(_dpp_query(spark, partitioned_orders))
        assert "dynamicpruningexpression" not in plan.lower()
        got = sorted(
            map(tuple, _dpp_query(spark, partitioned_orders).collect())
        )
    finally:
        spark.conf.set(conf, saved)
    assert got == want
