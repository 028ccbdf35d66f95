"""Wave 5: the remaining TPC-H shapes expressible over the synthetic
star schema (no partsupp table, so Q2/Q9/Q11/Q16/Q20 are out of
scope by data, not by capability) — Q7 nation-pair volume, Q8 market
share, Q10 returned-item top customers, Q14 promo share, Q17
small-quantity loss, Q22 idle-customer balance.

All money math follows the registry float policy: exact
DECIMAL(12,2) arithmetic, CAST AS DOUBLE at the end; averages are
decimal-sum-double / count so both engines divide identical values.

Scale notes are per-query; the common theme: nation/region/part are
broadcast dims, lineitem⋈orders shuffles once on orderkey, and every
date filter reaches the parquet scan for row-group pruning.
"""

from pyspark.sql import DataFrame, SparkSession
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


def _volume():
    return _dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast(
        "decimal(12,2)"
    )


def _mvolume():
    """_volume() as its exact 4-dp integer micro (functions/money.py)."""
    return money_micro(F.col("l_extendedprice")) * money_micro(
        F.lit(1) - F.col("l_discount")
    )


@register(
    "q7_nation_volume",
    oracle="""
    SELECT supp_nation, cust_nation, ship_year,
           CAST(SUM(volume) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             EXTRACT(year FROM l_shipdate) AS ship_year,
             CAST(l_extendedprice AS DECIMAL(12,2))
               * CAST(1 - l_discount AS DECIMAL(12,2)) AS volume
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON n1.n_nationkey = s_nationkey
      JOIN nation n2 ON n2.n_nationkey = c_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1995-01-01'
        AND l_shipdate <  TIMESTAMP '1997-01-01'
    )
    GROUP BY supp_nation, cust_nation, ship_year
    """,
    doc="TPC-H Q7: cross-nation shipping volume. The two nation "
    "lookups broadcast; the nation-name disjunction is applied AFTER "
    "both joins but Catalyst infers nationkey IN-lists onto the "
    "supplier/customer scans. lineitem⋈orders is the only shuffle.",
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    j = (
        li.join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    # Micro respell tried and REVERTED (r15, measured): the two-level
    # long-micro pattern (q8's) read 1.3-1.46x SLOWER here across two
    # interleaved cur-vs-ref microbench rounds at sf0.1 (0.86/0.83 s
    # vs 0.65/0.57 s medians) — the nation-pair predicate is selective
    # enough that the surviving rows' decimal cost is below one extra
    # aggregation stage, the same shape that rejected q6/q19 in r14.
    # Groups are unbounded per group, so a single-level long sum is
    # not provably overflow-safe and two-level is the only micro
    # option. Decimal kept.
    return (
        j.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("ship_year"),
            _volume().alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "ship_year")
        .agg(F.sum("volume").cast("double").alias("revenue"))
    )


@register(
    "q8_market_share",
    oracle="""
    SELECT ship_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_1' THEN volume
                         ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM (
      SELECT EXTRACT(year FROM o_orderdate) AS ship_year,
             n1.n_name AS supp_nation,
             CAST(l_extendedprice AS DECIMAL(12,2))
               * CAST(1 - l_discount AS DECIMAL(12,2)) AS volume
      FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON n1.n_nationkey = s_nationkey
      JOIN nation n2 ON n2.n_nationkey = c_nationkey
      JOIN region    ON r_regionkey = n2.n_regionkey
      WHERE r_name = 'AFRICA' AND p_type = 'PROMO'
    )
    GROUP BY ship_year
    """,
    doc="TPC-H Q8: a nation's market share of PROMO volume among "
    "AFRICA customers by order year. Six broadcast dims around one "
    "lineitem⋈orders shuffle; the share is a ratio of two exact "
    "decimal sums divided as doubles (policy: identical dividend and "
    "divisor on both engines, division last).",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "AFRICA")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region")
    )
    j = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(region), F.col("n2_region") == region.r_regionkey)
    )
    # exact 4-dp micro volume, two-level over spark_partition_id()
    # (few year groups, unbounded rows → partition-bounded long sums;
    # functions/money.py, guide §2.5). The share divides the SAME
    # exact dividend/divisor doubles as the decimal formulation.
    vol = j.select(
        F.year("o_orderdate").alias("ship_year"),
        "supp_nation",
        F.spark_partition_id().alias("_pid"),
        _mvolume().alias("mvol"),
    )
    lvl1 = vol.groupBy("ship_year", "_pid").agg(
        F.sum(
            F.when(F.col("supp_nation") == "NATION_1", F.col("mvol")).otherwise(
                F.lit(0).cast("long")
            )
        ).alias("snat"),
        F.sum("mvol").alias("sall"),
    )
    return lvl1.groupBy("ship_year").agg(
        (
            micro_sum_to_double(F.col("snat"), 10_000)
            / micro_sum_to_double(F.col("sall"), 10_000)
        ).alias("mkt_share")
    )


@register(
    "q10_returned_revenue",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON n_nationkey = c_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-07-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                 * CAST(1 - l_discount AS DECIMAL(12,2))) DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10: top-20 customers by returned-item revenue in a "
    "quarter-pair. The ORDER BY ranks on the EXACT decimal sum (not "
    "the double) with a custkey tie-break, so the LIMIT cut is "
    "deterministic and engine-portable. Spark plans the cut as "
    "TakeOrderedAndProject — no global sort of the aggregate.",
)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
    )
    # exact 4-dp micro revenue per customer (functions/money.py):
    # single-level long sum, overflow-safe by structure (a customer's
    # returned lineitems in one quarter-pair; bound ~8.8e9 rows per
    # customer, ANSI throws beyond). The top-20 cut orders by the
    # EXACT micro total — the same order as the exact decimal sum.
    agg = j.groupBy("c_custkey", "c_name", "n_name").agg(
        F.sum(_mvolume()).alias("rev_micro")
    )
    return (
        agg.orderBy(F.desc("rev_micro"), "c_custkey")
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            micro_to_double(F.col("rev_micro"), 10_000).alias("revenue"),
        )
    )


@register(
    "q14_promo_share",
    oracle="""
    SELECT CAST(100 AS DOUBLE)
           * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN volume
                           ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
           / CAST(SUM(volume) AS DOUBLE) AS promo_revenue_pct
    FROM (
      SELECT p_type,
             CAST(l_extendedprice AS DECIMAL(12,2))
               * CAST(1 - l_discount AS DECIMAL(12,2)) AS volume
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-02-01'
    )
    """,
    doc="TPC-H Q14: PROMO revenue share for one month. part "
    "broadcasts; the month filter prunes lineitem row groups at the "
    "scan; ratio-of-exact-decimals divided as doubles (policy).",
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    zero = F.lit(0).cast("decimal(12,2)")
    return j.select("p_type", _volume().alias("volume")).agg(
        (
            F.lit(100).cast("double")
            * F.sum(F.when(F.col("p_type") == "PROMO", F.col("volume")).otherwise(zero))
            .cast("double")
            / F.sum("volume").cast("double")
        ).alias("promo_revenue_pct")
    )


@register(
    "q17_small_quantity_loss",
    oracle="""
    WITH per_part AS (
      SELECT l_partkey AS avg_partkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
               / COUNT(*) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
             / 7.0 AS avg_yearly_loss
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN per_part ON avg_partkey = l_partkey
    WHERE p_brand = 'Brand#23' AND l_quantity < 0.2 * avg_qty
    """,
    doc="TPC-H Q17: revenue loss from below-average-quantity lines. "
    "The correlated AVG subquery becomes a self-aggregate joined back "
    "on partkey — both sides shuffle on l_partkey so the join is "
    "co-partitioned; avg is decimal-sum-double / count (policy) so "
    "the 0.2*avg threshold compares identically in both engines.",
)
def q17_small_quantity_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#23")
    # Per-part quantity sums as exact 2-dp micros (r15): the avg
    # subquery scans ALL of lineitem, so its DECIMAL(22,2) buffer was
    # this query's q1-class cost. Single-level long sum, overflow-safe
    # by structure: quantity <= ~1e2 -> micro <= ~1e4, bound ~9e14
    # rows per part (ANSI throws beyond). micro_to_double emits the
    # same exact-sum double the decimal cast did, so the 0.2*avg
    # threshold compares identically. Measured at sf0.1 (two
    # interleaved cur-vs-ref microbench rounds): 0.82/0.81 s ->
    # 0.43/0.42 s medians (OPTIMIZATION_r15.md).
    per_part = li.groupBy(F.col("l_partkey").alias("avg_partkey")).agg(
        (
            micro_to_double(F.sum(money_micro(F.col("l_quantity"))), 100)
            / F.count(F.lit(1))
        ).alias("avg_qty")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(per_part, li.l_partkey == F.col("avg_partkey"))
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly_loss"
            )
        )
    )


@register(
    "q22_idle_balances",
    oracle="""
    WITH cutoff AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
               / COUNT(*) AS avg_bal
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT n_name,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
    FROM customer
    JOIN nation ON n_nationkey = c_nationkey, cutoff
    WHERE c_acctbal > avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY n_name
    """,
    doc="TPC-H Q22 (phone-prefix predicate replaced by the nation "
    "dim this schema carries; 'no orders' tightened to 'dormant "
    "since 2000' because the synthetic data gives every customer at "
    "least one order): rich customers gone quiet. The global-average "
    "scalar broadcasts; NOT EXISTS is a left-anti join on custkey "
    "against the date-filtered orders; balances sum as exact "
    "decimals.",
)
def q22_idle_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    cutoff = customer.where(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(12,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    rich = customer.join(F.broadcast(cutoff)).where(F.col("c_acctbal") > F.col("avg_bal"))
    recent = orders.where(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    ).select("o_custkey")
    idle = rich.join(recent, rich.c_custkey == F.col("o_custkey"), "left_anti")
    return (
        idle.join(F.broadcast(nation), idle.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )


@register(
    "q12_late_shipment_priority",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate >= o_orderdate + INTERVAL 60 DAY
    GROUP BY l_linestatus
    """,
    doc="TPC-H Q12 shape (shipmode→linestatus, commit/receipt lag → "
    "ship-after-order lag; the synthetic schema carries no "
    "l_shipmode/l_commitdate): late shipments bucketed by order "
    "priority via conditional aggregation. The interval predicate is "
    "a join residual (compares columns of both sides), evaluated "
    "post-join but before the aggregate — one shuffle total.",
)
def q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, li.l_orderkey == orders.o_orderkey)
        .where(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )
