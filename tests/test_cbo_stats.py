"""Cost-based-optimizer evidence: ANALYZE TABLE statistics change the
physical join strategy.

The 100 TB relevance: a dimension table that is large on disk but tiny
after a selective filter is broadcast-able ONLY if the optimizer can
estimate the post-filter size. Without column stats Spark propagates
the (column-pruned) scan estimate through the Filter unchanged and
picks a SortMergeJoin; with `ANALYZE ... FOR ALL COLUMNS` the CBO's
filter-selectivity estimation shrinks the estimate below the broadcast
threshold and the same query compiles to a BroadcastHashJoin — no code
change, exactly the "let Catalyst optimize, but feed it stats"
operating rule SCALING.md prescribes."""

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


def _est_bytes(df) -> int:
    return int(str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))


@pytest.fixture()
def cbo_session(spark):
    saved = spark.conf.get("spark.sql.cbo.enabled")
    saved_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    yield spark
    spark.conf.set("spark.sql.cbo.enabled", saved)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved_thr)


def test_analyze_stats_flip_smj_to_broadcast(cbo_session, sf_dir):
    spark = cbo_session
    load_table(spark, sf_dir, "orders").write.mode("overwrite").saveAsTable(
        "cbo_orders_t"
    )
    load_table(spark, sf_dir, "customer").write.mode("overwrite").saveAsTable(
        "cbo_cust_t"
    )
    try:
        def dim():
            # highly selective filter + 2-column projection: the shape
            # only column stats can size correctly
            return (
                spark.table("cbo_cust_t")
                .where(F.col("c_custkey") < 3)
                .select("c_custkey", "c_mktsegment")
            )

        def q():
            return (
                spark.table("cbo_orders_t")
                .join(dim(), F.col("o_custkey") == F.col("c_custkey"))
                .groupBy("c_mktsegment")
                .count()
            )

        est_before = _est_bytes(dim())

        spark.sql("ANALYZE TABLE cbo_cust_t COMPUTE STATISTICS FOR ALL COLUMNS")
        spark.catalog.refreshTable("cbo_cust_t")  # drop pre-stats relation

        est_after = _est_bytes(dim())
        # the CBO estimate must shrink (selectivity now estimable) and
        # be row-count-aware
        assert est_after < est_before
        stats = dim()._jdf.queryExecution().optimizedPlan().stats()
        assert stats.rowCount().isDefined()
        n_est = int(str(stats.rowCount().get()))
        n_true = dim().count()
        assert 0 < n_est <= 5 * max(n_true, 1)  # sane selectivity estimate

        # pin the broadcast threshold BETWEEN the two estimates: with
        # stats the dim broadcasts, without them it must not
        thr = (est_before + est_after) // 2
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(thr))

        after = _plan(q())
        assert "BroadcastHashJoin" in after and "SortMergeJoin" not in after

        # drop the stats view of the world: a fresh un-analyzed copy of
        # the same data at the same threshold goes back to SMJ
        spark.table("cbo_cust_t").write.mode("overwrite").saveAsTable(
            "cbo_cust_nostats_t"
        )

        def q_nostats():
            d = (
                spark.table("cbo_cust_nostats_t")
                .where(F.col("c_custkey") < 3)
                .select("c_custkey", "c_mktsegment")
            )
            return (
                spark.table("cbo_orders_t")
                .join(d, F.col("o_custkey") == F.col("c_custkey"))
                .groupBy("c_mktsegment")
                .count()
            )

        before = _plan(q_nostats())
        assert "SortMergeJoin" in before and "BroadcastHashJoin" not in before
        # same rows either way — the strategy changed, not the result
        assert sorted(map(tuple, q().collect())) == sorted(
            map(tuple, q_nostats().collect())
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS cbo_orders_t")
        spark.sql("DROP TABLE IF EXISTS cbo_cust_t")
        spark.sql("DROP TABLE IF EXISTS cbo_cust_nostats_t")
