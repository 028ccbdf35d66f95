"""Wave 4: deeper TPC-H shapes and runtime-filter scale patterns —
disjunctive OR-of-ANDs predicates (Q19), view + scalar-subquery max
(Q15), correlated EXISTS / NOT EXISTS pairs (Q21), interval RANGE
window frames, and the selective-probe join that Spark's runtime
Bloom-filter pruning targets at cluster scale (plan evidence in
tests/test_plans.py::test_bloom_runtime_filter_injection).

Reference parity: the reference engine evaluates row predicates one
document at a time inside its fetch loop (fetch_legal_docs.py:32,
import requests.py:120-121); these queries re-express the same
filter/join/aggregate semantics declaratively so Catalyst can push,
prune, and reorder them.
"""

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ethiopia_legal_etl_spark.functions.money import (
    micro_sum_to_double,
    micro_to_double,
    money_micro,
)
from ethiopia_legal_etl_spark.operators.registry import register
from ethiopia_legal_etl_spark.sources.tables import load_table


def _dec(col: str):
    return F.col(col).cast("decimal(12,2)")


@register(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
    doc="TPC-H Q19 shape: OR-of-ANDs disjunctive predicate across the "
    "join. Catalyst extracts the common p_size>=1 conjunct and the "
    "brand IN-list toward the part scan; part stays broadcast-side. "
    "At 100 TB the lineitem quantity bands still prune via min/max "
    "row-group statistics because each disjunct bounds l_quantity.",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    band = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#34")
        & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(20, 30)
    )
    # Deliberately KEPT on decimal sums (r14 optimization round): the
    # long-micro two-level respell (functions/money.py) was tried here
    # and measured SLOWER in the interleaved A/B (1.18-1.23x) — the
    # disjunctive brand/size/quantity bands are selective enough that
    # the surviving rows' decimal cost is smaller than one extra
    # aggregation stage. Single global group, so single-level longs
    # would overflow near 9e9 rows; decimal is the right buffer here.
    return j.where(band).agg(
        F.sum(
            _dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast("decimal(12,2)")
        )
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                 * CAST(1 - l_discount AS DECIMAL(12,2))) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
    """,
    doc="TPC-H Q15: revenue view + scalar-subquery max. The max is an "
    "exact DECIMAL so the equality is engine-portable. Spark computes "
    "the scalar via a broadcast cross-join of a 1-row aggregate — the "
    "same plan Catalyst produces for an uncorrelated scalar subquery; "
    "the revenue view is computed once and reused (no re-scan).",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    revenue = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(
                _dec("l_extendedprice")
                * (F.lit(1) - F.col("l_discount")).cast("decimal(12,2)")
            ).alias("total_rev")
        )
    )
    max_rev = revenue.agg(F.max("total_rev").alias("max_rev"))
    top = revenue.join(F.broadcast(max_rev), F.col("total_rev") == F.col("max_rev"))
    return (
        F.broadcast(supplier)
        .join(top, F.col("s_suppkey") == F.col("supplier_no"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_rev").cast("double").alias("total_revenue"),
        )
    )


@register(
    "q21_sole_return_supplier",
    oracle="""
    SELECT s_suppkey, s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON l1.l_suppkey = s_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_suppkey, s_name
    """,
    doc="TPC-H Q21 shape: correlated EXISTS + NOT EXISTS on the same "
    "fact table. Spark expresses them as a left-semi and a left-anti "
    "join keyed on l_orderkey — both shuffle on the SAME key as the "
    "orders join, so at 100 TB all three hash-joins reuse one "
    "exchange of lineitem (co-partitioned), and supplier broadcasts.",
)
def q21_sole_return_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")

    l1 = li.where(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey")
    finished = orders.where(F.col("o_orderstatus") == "F").select("o_orderkey")
    l1 = l1.join(finished, l1.l_orderkey == finished.o_orderkey).drop("o_orderkey")

    others = li.select(
        F.col("l_orderkey").alias("o_key"), F.col("l_suppkey").alias("o_supp")
    )
    exists_other = l1.join(
        others,
        (l1.l_orderkey == others.o_key) & (l1.l_suppkey != others.o_supp),
        "left_semi",
    )
    other_returns = li.where(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("r_key"), F.col("l_suppkey").alias("r_supp")
    )
    sole = exists_other.join(
        other_returns,
        (exists_other.l_orderkey == F.col("r_key"))
        & (exists_other.l_suppkey != F.col("r_supp")),
        "left_anti",
    )
    return (
        sole.join(F.broadcast(supplier), sole.l_suppkey == supplier.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "window_range_7day_frame",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
             PARTITION BY o_custkey
             ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
             RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS rolling_7d_spend
    FROM orders
    """,
    doc="RANGE window frame over event time: per-customer rolling "
    "7-day spend. A RANGE frame is peer-aware (same-timestamp rows "
    "share a frame) so the result is deterministic under shuffle "
    "reordering, unlike a ROWS frame over ties. Partitioned by "
    "customer — no global window, scales with the key count.",
)
def window_range_7day_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").cast("timestamp").cast("long"))
        .rangeBetween(-7 * 86400, 0)
    )
    # exact 2-dp micro window sum (functions/money.py): the running
    # LONG frame total replaces a DECIMAL(22,2) frame buffer; one
    # decimal→double conversion per output row. A frame total
    # overflows only past ~1.5e11 rows per 7-day-per-customer frame
    # (ANSI throws if ever hit). Values identical.
    return orders.select(
        "o_orderkey",
        "o_custkey",
        micro_to_double(
            F.sum(money_micro(F.col("o_totalprice"))).over(w), 100
        ).alias("rolling_7d_spend"),
    )


@register(
    "bloom_pruned_join",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS gross
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY l_returnflag
    """,
    doc="Selective-probe join: a filtered dimension prunes a large "
    "fact. At test scale the urgent-orders side broadcasts (optimal). "
    "At 100 TB orders exceeds the broadcast threshold and the join "
    "shuffles — there Spark injects a runtime Bloom filter built from "
    "o_orderkey on the creation side and applies might_contain() at "
    "the lineitem scan, cutting shuffle input by the selectivity of "
    "the priority filter. Injection is proven under shuffle-join "
    "conditions in tests/test_plans.py::"
    "test_bloom_runtime_filter_injection.",
)
def bloom_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    # exact 2-dp micro gross, two-level over spark_partition_id()
    # (r15): the URGENT filter keeps ~1/5 of the fact rows, enough for
    # the DECIMAL(22,2) buffer to show; groups (3 returnflags) are
    # unbounded per group so level 1 long sums stay partition-bounded
    # and level 2 re-sums in DECIMAL(38,0). Interleaved same-session
    # probe at sf0.1: decimal 0.70/0.56/0.41 s vs micro
    # 0.70/0.42/0.42 s per aligned run, rows identical.
    j = li.join(orders, li.l_orderkey == orders.o_orderkey)
    lvl1 = (
        j.select(
            "l_returnflag",
            F.spark_partition_id().alias("_pid"),
            money_micro(F.col("l_extendedprice")).alias("m"),
        )
        .groupBy("l_returnflag", "_pid")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("m").alias("sm"))
    )
    return lvl1.groupBy("l_returnflag").agg(
        F.sum("cnt").alias("n_lines"),
        micro_sum_to_double(F.col("sm"), 100).alias("gross"),
    )
