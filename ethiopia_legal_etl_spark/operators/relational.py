"""Relational core: scans, filters, joins (equi/semi/anti/non-equi/
as-of), aggregates (group/rollup/cube/distinct), windows (rank/
analytic/frames), sorts/top-k, set ops, scalar function families
(string/date/json/math).

This is SURVEY.md §2.B's relational inventory. Everything is built-in
DataFrame API — Catalyst handles pushdown, pruning, join selection;
AQE handles runtime coalescing and skew. Scale notes per query are in
the docstrings (the 100 TB design point from BASELINE.md).

Reference anchors: semi/anti join generalize the incremental-skip
anti-join (fetch_legal_docs.py:41-43, SURVEY.md A-6); top-k
generalizes the 50-line log tail (deploy-gh-pages.yml:19-20, A-16);
the group-aggregates generalize the link count (scrape_pdf_links.py:20,
A-5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ethiopia_legal_etl_spark.functions.money import (
    micro_sum_to_double,
    micro_to_double,
    money_micro,
)
from ethiopia_legal_etl_spark.operators.registry import register
from ethiopia_legal_etl_spark.sources.tables import load_table


# --------------------------------------------------------------------
# Aggregation: TPC-H Q1 shape — the flagship scan+filter+agg.
# Scale: single shuffle on a 2-value x 2-value grouping key; partial
# aggregation (map-side combine) reduces 100 TB of lineitem to a few
# rows per partition before the exchange. No skew risk (bounded keys).
# --------------------------------------------------------------------
@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)           AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)      AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE)     AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - l_discount AS DECIMAL(12,2))
                    * CAST(1 + l_tax AS DECIMAL(12,2))) AS DOUBLE)          AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)      AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)      AS avg_disc,
           COUNT(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 pricing summary over lineitem",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Money sums aggregate EXACT integer micros of the 2-dp decimals
    # (products are exact ≤6-dp micros — no fp summation-order drift,
    # no round-tie mismatches vs the oracle), then one decimal→double
    # conversion per output cell. Identical values to the r13 decimal
    # formulation (probed cell-exact at sf0.1 and partition-count
    # invariant), ~2.5x faster: a SUM over DECIMAL(12,2) carries a
    # precision-22 buffer that leaves the compact-long path and
    # serializes a BigDecimal per update (functions/money.py;
    # optimization guide §1.2 per-task work).
    #
    # Two-level aggregation (guide §2.5): the grouping key has only 4
    # values, so a single-level long sum would overflow 2^63 around
    # 8e7 rows/group; level 1 adds spark_partition_id() — the long
    # sums are then bounded by rows-per-scan-partition (~60x margin at
    # 1 GB splits) — and level 2 re-aggregates the tiny 4x|partitions|
    # table in DECIMAL(38,0). The extra exchange carries ≤ 4 rows per
    # upstream partition (OPTIMIZATION_r14.md).
    li = load_table(spark, sf_dir, "lineitem")
    mq = money_micro(F.col("l_quantity"))
    mp = money_micro(F.col("l_extendedprice"))
    mdisc = money_micro(F.lit(1) - F.col("l_discount"))
    mtax = money_micro(F.lit(1) + F.col("l_tax"))
    md = money_micro(F.col("l_discount"))
    lvl1 = (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .select(
            "l_returnflag",
            "l_linestatus",
            F.spark_partition_id().alias("_pid"),
            mq.alias("mq"),
            mp.alias("mp"),
            (mp * mdisc).alias("mpd"),
            (mp * mdisc * mtax).alias("mpdt"),
            md.alias("md"),
        )
        .groupBy("l_returnflag", "l_linestatus", "_pid")
        .agg(
            F.sum("mq").alias("sq"),
            F.sum("mp").alias("sp"),
            F.sum("mpd").alias("spd"),
            F.sum("mpdt").alias("spdt"),
            F.sum("md").alias("sd"),
            F.count(F.lit(1)).alias("c"),
        )
    )
    sum_qty = micro_sum_to_double(F.col("sq"), 100)
    sum_price = micro_sum_to_double(F.col("sp"), 100)
    return lvl1.groupBy("l_returnflag", "l_linestatus").agg(
        sum_qty.alias("sum_qty"),
        sum_price.alias("sum_base_price"),
        micro_sum_to_double(F.col("spd"), 10_000).alias("sum_disc_price"),
        micro_sum_to_double(F.col("spdt"), 1_000_000).alias("sum_charge"),
        # avgs as exact-sum-double / count: identical doubles on both
        # engines, no round-tie exposure (see registry.py)
        (sum_qty / F.sum("c")).alias("avg_qty"),
        (sum_price / F.sum("c")).alias("avg_price"),
        (micro_sum_to_double(F.col("sd"), 100) / F.sum("c")).alias("avg_disc"),
        F.sum("c").alias("count_order"),
    )


# --------------------------------------------------------------------
# 3-way equi-join + agg + top-k (TPC-H Q3 shape).
# Scale: orders⋈lineitem is the big shuffle join on l_orderkey/
# o_orderkey; customer side is filtered then joined — at 100 TB,
# customer-after-filter is small enough that AQE converts it to a
# broadcast. Filters sit before joins so pushdown reaches the scans.
# --------------------------------------------------------------------
@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
           o_orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate  > TIMESTAMP '1995-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shipping priority: customer⋈orders⋈lineitem top-10",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    # Revenue summed as exact 4-dp integer micros (functions/money.py;
    # value-identical to the decimal formulation, no BigDecimal agg
    # buffer). Single-level is overflow-safe here by structure: the
    # group key is l_orderkey and an order has a bounded lineitem
    # count, so the per-group micro total stays ~1e10 ≪ 2^63 at any
    # corpus size (ANSI throws if that ever breaks).
    mrev = money_micro(F.col("l_extendedprice")) * money_micro(
        F.lit(1) - F.col("l_discount")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(micro_to_double(F.sum(mrev), 10_000).alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate")
    )


# --------------------------------------------------------------------
# 6-way star join with explicit broadcast of the dimension chain
# (TPC-H Q5 shape). Scale: region(5)⋈nation(25)⋈supplier(small) are
# broadcast — zero shuffle for the dim side; the only exchanges are
# on the fact keys. This is the canonical "broadcast the small dims"
# pattern from SURVEY.md §4.
# --------------------------------------------------------------------
@register(
    "q5_region_revenue",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
    FROM region
      JOIN nation   ON n_regionkey = r_regionkey
      JOIN customer ON c_nationkey = n_nationkey
      JOIN orders   ON o_custkey   = c_custkey
      JOIN lineitem ON l_orderkey  = o_orderkey
      JOIN supplier ON l_suppkey   = s_suppkey AND s_nationkey = c_nationkey
    WHERE o_orderdate >= TIMESTAMP '1995-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
    doc="TPC-H Q5 local supplier volume: star join w/ broadcast dims",
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (supp.s_nationkey == cust.c_nationkey),
        )
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        # exact 4-dp micro revenue, two-level (25 nation groups are
        # unbounded per group → level 1 adds spark_partition_id() so
        # the long sums stay partition-bounded; level 2 re-sums the
        # tiny table in DECIMAL(38,0) — functions/money.py, guide §2.5)
        .select(
            "n_name",
            F.spark_partition_id().alias("_pid"),
            (
                money_micro(F.col("l_extendedprice"))
                * money_micro(F.lit(1) - F.col("l_discount"))
            ).alias("mrev"),
        )
        .groupBy("n_name", "_pid")
        .agg(F.sum("mrev").alias("srev"))
        .groupBy("n_name")
        .agg(micro_sum_to_double(F.col("srev"), 10_000).alias("revenue"))
    )


# --------------------------------------------------------------------
# Outer joins. Left join preserving zero-order customers; full outer
# reconciling two aggregates. Scale: aggregate-before-join shrinks
# both sides to |keys| rows ahead of the join shuffle.
# --------------------------------------------------------------------
@register(
    "join_left_order_counts",
    oracle="""
    SELECT c_custkey, c_name,
           COUNT(o_orderkey)                        AS order_cnt,
           ROUND(COALESCE(SUM(o_totalprice), 0), 2) AS total_spend
    FROM customer LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey, c_name
    """,
    doc="left outer join: customers incl. those with zero orders",
)
def join_left_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, orders.o_custkey == cust.c_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("order_cnt"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias(
                "total_spend"
            ),
        )
    )


@register(
    "join_full_nation_balance",
    oracle="""
    SELECT COALESCE(c.nk, s.nk)        AS nationkey,
           ROUND(COALESCE(c.cust_bal, 0), 2) AS cust_bal,
           ROUND(COALESCE(s.supp_bal, 0), 2) AS supp_bal
    FROM (SELECT c_nationkey AS nk, SUM(c_acctbal) AS cust_bal
          FROM customer GROUP BY c_nationkey) c
    FULL JOIN (SELECT s_nationkey AS nk, SUM(s_acctbal) AS supp_bal
               FROM supplier GROUP BY s_nationkey) s
      ON c.nk = s.nk
    """,
    doc="full outer join reconciling customer vs supplier balances",
)
def join_full_nation_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.sum("c_acctbal").alias("cust_bal"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.sum("s_acctbal").alias("supp_bal"))
    )
    return c.join(s, "nk", "full").select(
        F.col("nk").alias("nationkey"),
        F.round(F.coalesce("cust_bal", F.lit(0.0)), 2).alias("cust_bal"),
        F.round(F.coalesce("supp_bal", F.lit(0.0)), 2).alias("supp_bal"),
    )


# --------------------------------------------------------------------
# Semi / anti joins — the generalization of the reference's
# incremental-skip (fetch_legal_docs.py:41-43 = left_anti against the
# sink listing). Scale: both avoid materializing the right side's
# payload; anti-join against a sink listing is how incremental 100 TB
# reprocessing stays incremental.
# --------------------------------------------------------------------
@register(
    "semi_customers_with_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    doc="left semi join (EXISTS)",
)
def semi_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(
        orders, orders.o_custkey == cust.c_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "anti_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    doc="left anti join (NOT EXISTS) — A-6 incremental-skip shape",
)
def anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(
        orders, orders.o_custkey == cust.c_custkey, "left_anti"
    ).select("c_custkey", "c_name")


# --------------------------------------------------------------------
# Non-equi (theta) join. Spark executes this as broadcast-nested-loop;
# acceptable because both sides are dimension-sized. Documented cost:
# never put a fact table on both sides of a pure theta join at scale —
# band it (add a coarse equi bucket) first.
# --------------------------------------------------------------------
@register(
    "theta_nation_pairs",
    oracle="""
    SELECT a.n_regionkey AS regionkey, COUNT(*) AS pair_cnt
    FROM nation a JOIN nation b
      ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
    GROUP BY a.n_regionkey
    """,
    doc="non-equi self join: unordered nation pairs within a region",
)
def theta_nation_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = load_table(spark, sf_dir, "nation").alias("a")
    b = load_table(spark, sf_dir, "nation").alias("b")
    return (
        a.join(
            b,
            (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
            & (F.col("a.n_nationkey") < F.col("b.n_nationkey")),
        )
        .groupBy(F.col("a.n_regionkey").alias("regionkey"))
        .agg(F.count(F.lit(1)).alias("pair_cnt"))
    )


# --------------------------------------------------------------------
# As-of join: for each 'error' event, the user's most recent 'purchase'
# at or before it. Spark lacks a native as-of join, so: range join on
# (user, ts<=ts) then row_number()==1 — with the range pre-banded by
# the user_id equi key, Catalyst plans a hash join + window, not a
# cartesian. Oracle uses DuckDB's native ASOF JOIN.
# Scale: the window partitions by the error event id — no global sort;
# skewed users are handled by AQE skew-join on the equi key.
# --------------------------------------------------------------------
@register(
    "asof_error_prev_purchase",
    oracle="""
    WITH err AS (SELECT event_id, ts, user_id FROM events WHERE event_type = 'error'),
         pur AS (
           SELECT user_id, ts, MAX(event_id) AS p_event_id
           FROM events WHERE event_type = 'purchase'
           GROUP BY user_id, ts
         )
    SELECT e.event_id, e.user_id, p.p_event_id AS prev_purchase_id
    FROM err e ASOF JOIN pur p
      ON e.user_id = p.user_id AND e.ts >= p.ts
    """,
    doc="as-of join: nearest purchase ≤ each error event, per user",
)
def asof_error_prev_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    err = ev.where(F.col("event_type") == "error").select(
        "event_id", "ts", "user_id"
    )
    # dedup purchases on (user, ts) so the as-of pick is deterministic
    pur = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("p_event_id"))
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("p_ts"),
            "p_event_id",
        )
    )
    joined = err.join(
        pur,
        (err.user_id == pur.p_user_id) & (pur.p_ts <= err.ts),
        "inner",
    )
    w = Window.partitionBy("event_id").orderBy(F.desc("p_ts"), F.desc("p_event_id"))
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select("event_id", "user_id", F.col("p_event_id").alias("prev_purchase_id"))
    )


# --------------------------------------------------------------------
# Sort / top-k — generalization of the 50-line log tail (A-16).
# Scale: orderBy().limit(k) compiles to TakeOrderedAndProject — each
# partition keeps a k-heap, only k rows per partition reach the driver
# stage. No global sort of 100 TB.
# --------------------------------------------------------------------
@register(
    "topk_orders_by_price",
    oracle="""
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS total_price
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    doc="top-k by sort key with deterministic tiebreak (A-16 shape)",
)
def topk_orders_by_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("total_price"))
    )


# --------------------------------------------------------------------
# Window functions: ranking / analytic / frames.
# Scale: one shuffle on the partition key each; running frames are
# computed streaming within partition (no buffering beyond the frame).
# --------------------------------------------------------------------
@register(
    "window_rank_orders",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS total_price,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn,
             RANK()       OVER (PARTITION BY o_custkey
                                ORDER BY o_orderstatus) AS status_rank
      FROM orders
    ) WHERE rn <= 3
    """,
    doc="ranking window: top-3 orders per customer",
)
def window_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    w2 = Window.partitionBy("o_custkey").orderBy("o_orderstatus")
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total_price"),
            F.row_number().over(w).alias("rn"),
            F.rank().over(w2).alias("status_rank"),
        )
        .where("rn <= 3")
    )


@register(
    "window_running_user_value",
    oracle="""
    SELECT event_id, user_id,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING), 2) AS running_value,
           ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg3
    FROM events
    """,
    doc="frame windows: running sum + 3-row moving average per user",
)
def window_running_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    order = [F.col("ts"), F.col("event_id")]
    w_run = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_mov = Window.partitionBy("user_id").orderBy(*order).rowsBetween(-2, 0)
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w_run), 2).alias("running_value"),
        F.round(F.avg("value").over(w_mov), 4).alias("moving_avg3"),
    )


@register(
    "window_lag_lead_delta",
    oracle="""
    SELECT event_id, user_id,
           ROUND(value - LAG(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id), 2) AS delta_prev,
           ROUND(LEAD(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 2)         AS next_value,
           ROUND(FIRST_VALUE(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                          ROWS UNBOUNDED PRECEDING), 2)                    AS first_value
    FROM events
    """,
    doc="analytic windows: lag/lead/first_value per user timeline",
)
def window_lag_lead_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_first = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.col("value") - F.lag("value").over(w), 2).alias("delta_prev"),
        F.round(F.lead("value").over(w), 2).alias("next_value"),
        F.round(F.first("value").over(w_first), 2).alias("first_value"),
    )


# --------------------------------------------------------------------
# Set operations + distinct.
# --------------------------------------------------------------------
@register(
    "set_except_custkeys",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    doc="EXCEPT: customers with finished but no open orders",
)
def set_except_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    f = orders.where("o_orderstatus = 'F'").select(F.col("o_custkey").alias("custkey"))
    o = orders.where("o_orderstatus = 'O'").select(F.col("o_custkey").alias("custkey"))
    # subtract = EXCEPT DISTINCT (exceptAll would keep leftover multiplicity)
    return f.subtract(o)


@register(
    "set_intersect_custkeys",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    doc="INTERSECT: customers with both finished and open orders",
)
def set_intersect_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    f = orders.where("o_orderstatus = 'F'").select(F.col("o_custkey").alias("custkey"))
    o = orders.where("o_orderstatus = 'O'").select(F.col("o_custkey").alias("custkey"))
    return f.intersect(o)


@register(
    "set_union_distinct_nations",
    oracle="""
    SELECT nk FROM (
      SELECT c_nationkey AS nk FROM customer
      UNION
      SELECT s_nationkey AS nk FROM supplier
    )
    """,
    doc="UNION DISTINCT across two sources",
)
def set_union_distinct_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.unionByName(s).distinct()


# --------------------------------------------------------------------
# Distinct aggregates. approx_count_distinct is registered rows-only
# (HLL estimates differ between engines by design) with the exact
# count as its oracle-checked twin.
# --------------------------------------------------------------------
@register(
    "agg_distinct_customers",
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS uniq_customers,
           COUNT(*)                  AS orders_cnt
    FROM orders
    GROUP BY o_orderstatus
    """,
    doc="COUNT(DISTINCT) per group",
)
def agg_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("uniq_customers"),
            F.count(F.lit(1)).alias("orders_cnt"),
        )
    )


@register(
    "agg_approx_distinct_customers",
    oracle=None,  # HLL sketch: estimate is engine-specific -> rows-only
    doc="approx_count_distinct (HyperLogLog) per group — the 100 TB path "
    "where exact distinct would shuffle every key. "
    "Rows-only verdict (r12): NOT convertible — Spark's HLL++ "
    "register layout and bias correction are implementation-specific; "
    "DuckDB's approx_count_distinct is a different HLL, so estimates "
    "differ legitimately. Ground truth: relative-error envelope vs "
    "exact distinct (property test).",
)
def agg_approx_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.approx_count_distinct("o_custkey", 0.01).alias("approx_uniq_customers"))
    )


@register(
    "agg_collect_concat",
    oracle="""
    SELECT o_custkey,
           ARRAY_TO_STRING(LIST(DISTINCT o_orderstatus ORDER BY o_orderstatus), ',') AS statuses,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_custkey
    """,
    doc="collect_set + concat_ws (A-11 page-concat generalized)",
)
def agg_collect_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_set("o_orderstatus"))).alias(
                "statuses"
            ),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


# --------------------------------------------------------------------
# Grouping sets / rollup / cube.
# --------------------------------------------------------------------
@register(
    "rollup_lineitem_flags",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           COUNT(*)                  AS cnt
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="ROLLUP over (returnflag, linestatus)",
)
def rollup_lineitem_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


@register(
    "cube_orders_status_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           ROUND(SUM(o_totalprice), 2) AS sum_price,
           COUNT(*)                    AS cnt
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="CUBE over (status, priority)",
)
def cube_orders_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


# --------------------------------------------------------------------
# Scalar function families (string / date / json / math + predicates).
# All whole-stage-codegen expressions — the A-10/A-13/A-14 string ops
# generalized to the driver tables.
# --------------------------------------------------------------------
@register(
    "scalar_string_part",
    oracle="""
    SELECT p_partkey,
           LOWER(p_name)                                  AS name_lower,
           UPPER(p_brand)                                 AS brand_upper,
           SUBSTRING(p_type, 1, 5)                        AS type_prefix,
           LENGTH(p_name)                                 AS name_len,
           REGEXP_EXTRACT(p_type, '([a-z]+)$', 1)         AS type_last_word,
           CONCAT_WS('|', p_brand, p_type)                AS brand_type,
           TRIM(CONCAT(' ', p_name, ' '))                 AS name_trimmed,
           REPLACE(p_name, ' ', '_')                      AS name_snake
    FROM part
    WHERE p_name LIKE '%a%' AND p_size BETWEEN 1 AND 40
    """,
    doc="string scalar family over part (A-10 generalized)",
)
def scalar_string_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.where(
        F.col("p_name").like("%a%") & F.col("p_size").between(1, 40)
    ).select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.length("p_name").alias("name_len"),
        F.regexp_extract("p_type", r"([a-z]+)$", 1).alias("type_last_word"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias(
            "name_trimmed"
        ),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
    )


@register(
    "scalar_date_orders",
    oracle="""
    SELECT o_orderkey,
           YEAR(o_orderdate)                                   AS order_year,
           MONTH(o_orderdate)                                  AS order_month,
           DAY(o_orderdate)                                    AS order_day,
           CAST(DATE_TRUNC('month', o_orderdate) AS DATE)     AS month_start,
           DATE_DIFF('day', o_orderdate, TIMESTAMP '1999-01-01') AS days_to_1999,
           STRFTIME(o_orderdate, '%Y-%m-%d')                   AS order_date_str
    FROM orders
    """,
    doc="date scalar family over orders",
)
def scalar_date_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.datediff(
            F.lit("1999-01-01").cast("date"), F.col("o_orderdate").cast("date")
        ).cast("long").alias("days_to_1999"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date_str"),
    )


@register(
    "scalar_math_lineitem",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount), 4)  AS net_price,
           ROUND(ABS(l_discount - l_tax), 4)             AS disc_tax_gap,
           CAST(FLOOR(l_quantity / 10) AS BIGINT)        AS qty_decile,
           ROUND(SQRT(l_extendedprice), 4)               AS price_sqrt,
           CAST(FLOOR(l_quantity) AS INTEGER) % 7        AS qty_mod7
    FROM lineitem
    WHERE l_quantity > 5
    """,
    doc="math scalar family over lineitem",
)
def scalar_math_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.where("l_quantity > 5").select(
        "l_orderkey",
        "l_linenumber",
        # round at 4dp: the exact product has ≤4 decimals (2dp × 2dp),
        # so no round-tie can occur (a tie would need a 5th decimal)
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
            "net_price"
        ),
        F.round(F.abs(F.col("l_discount") - F.col("l_tax")), 4).alias(
            "disc_tax_gap"
        ),
        F.floor(F.col("l_quantity") / 10).cast("long").alias("qty_decile"),
        F.round(F.sqrt("l_extendedprice"), 4).alias("price_sqrt"),
        # FLOOR before the int cast: DuckDB's double→int cast rounds,
        # Spark's truncates — floor on both sides pins the semantics
        (F.floor("l_quantity").cast("int") % 7).alias("qty_mod7"),
    )


@register(
    "scalar_json_events",
    oracle="""
    -- json_valid guard: DuckDB's json_extract RAISES on malformed
    -- JSON where Spark's get_json_object returns NULL; a truncated
    -- instrumentation payload must degrade to NULL on both sides
    -- (null-mirror corruption axis, r10)
    WITH e AS (
      SELECT event_type,
             CASE WHEN json_valid(props)
                  THEN CAST(json_extract_string(props, '$.k') AS INTEGER)
             END AS k
      FROM events
    )
    SELECT event_type,
           CAST(SUM(k) AS DOUBLE) / COUNT(k) AS avg_k,
           MAX(k)                            AS max_k,
           COUNT(*)                          AS cnt
    FROM e
    GROUP BY event_type
    """,
    doc="JSON extraction over events.props (get_json_object); malformed "
    "payloads extract as NULL on both engines",
)
def scalar_json_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        # exact integer sum / non-null count — identical on both engines
        (F.sum(k).cast("double") / F.count(k)).alias("avg_k"),
        F.max(k).alias("max_k"),
        F.count(F.lit(1)).alias("cnt"),
    )


@register(
    "predicates_null_in_like",
    oracle="""
    SELECT c_custkey,
           COALESCE(c_mktsegment, 'UNKNOWN')    AS segment,
           (c_acctbal IS NULL)                  AS bal_is_null,
           (c_mktsegment IN ('BUILDING', 'AUTOMOBILE')) AS in_two_segments,
           (c_name LIKE 'Customer%')            AS name_prefixed
    FROM customer
    WHERE c_acctbal BETWEEN -500 AND 10000 OR c_acctbal IS NULL
    """,
    doc="predicate family: BETWEEN / IN / LIKE / IS NULL / COALESCE",
)
def predicates_null_in_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.where(
        F.col("c_acctbal").between(-500, 10000) | F.col("c_acctbal").isNull()
    ).select(
        "c_custkey",
        F.coalesce("c_mktsegment", F.lit("UNKNOWN")).alias("segment"),
        F.col("c_acctbal").isNull().alias("bal_is_null"),
        F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE").alias(
            "in_two_segments"
        ),
        F.col("c_name").like("Customer%").alias("name_prefixed"),
    )
