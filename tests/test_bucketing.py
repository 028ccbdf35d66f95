"""Bucketed-table co-located join: writing both join sides bucketed on
the join key removes the per-query shuffle entirely — the storage
layout IS the exchange. This is the 100 TB pattern for repeated joins
on the same key (SURVEY.md §4: 'bucketing for co-located joins')."""

from __future__ import annotations

import pytest

from ethiopia_legal_etl_spark.plans.explain import formatted_plan
from ethiopia_legal_etl_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    # warehouse dir is a static conf, set at session creation (conftest)
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    (
        orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("b_orders")
    )
    (
        li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("b_lineitem")
    )
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    # disable broadcast so the join planning decision is about
    # co-location, not size (at 100 TB neither side broadcasts)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_orders").join(
            spark.table("b_lineitem"),
            spark.table("b_orders").o_orderkey
            == spark.table("b_lineitem").l_orderkey,
        )
        plan = formatted_plan(joined.select("o_orderkey", "l_quantity"))
        # co-located buckets: sort-merge join, NO Exchange on either side
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")


def test_bucketed_join_result_matches_plain_join(spark, sf_dir, bucketed_tables):
    bucketed_cnt = (
        spark.table("b_orders")
        .join(
            spark.table("b_lineitem"),
            spark.table("b_orders").o_orderkey
            == spark.table("b_lineitem").l_orderkey,
        )
        .count()
    )
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    plain_cnt = orders.join(li, orders.o_orderkey == li.l_orderkey).count()
    assert bucketed_cnt == plain_cnt
