"""Wave 11: the five TPC-H shapes whose canonical form needs the
partsupp table (absent from the synthetic schema — TESTDATA.md), each
re-expressed with ``lineitem`` as the part↔supplier bridge so the
*query pattern* is preserved exactly even though the bridge relation
differs:

- Q2  min-cost supplier: correlated-min subquery (window-min spelling)
  over a derived offer table, dims broadcast, deterministic top-100;
- Q9  product-type profit: 5-way join with a LIKE-filtered part dim,
  profit = revenue − cost proxy, grouped by nation × year;
- Q11 important stock: group totals filtered against a scalar-subquery
  fraction of the global total;
- Q16 supplier counts: COUNT(DISTINCT) per attribute triple with a
  NOT-IN anti-subquery on the supplier dim;
- Q20 excess-share suppliers: nested semi chain — per (part, supplier)
  share against the per-part total, then DISTINCT suppliers.

Reference parity note: the reference repo computes none of these (it
has no joins at all — SURVEY.md §2.A "explicitly absent"); these are
Layer-B engine surface mandated by BASELINE.json.

Money math follows the registry float policy (registry.py module doc):
DECIMAL(12,2) exact sums, CAST AS DOUBLE at the end.

Scale notes (100 TB design point): part/supplier/nation/region are
classic broadcast dims. The only large shuffles are the lineitem
aggregations keyed on (l_partkey[, l_suppkey]) — dense, high-NDV keys
with no skew hazard; AQE coalesces the post-agg partitions. Q2/Q20's
per-part window/self-join runs on the already-aggregated offer table
(|parts|×|suppliers| upper bound, ≪ lineitem), so the second shuffle
is small by construction.
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


# --------------------------------------------------------------------
# Q2 shape: minimum-cost supplier per part (correlated min subquery).
# Offer table = MIN(l_extendedprice) per (part, supplier) — exact 2dp
# decimal, so the min-equality join cannot suffer float divergence.
# --------------------------------------------------------------------
@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH offers AS (
      SELECT l_partkey, l_suppkey,
             MIN(CAST(l_extendedprice AS DECIMAL(12,2))) AS cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), ranked AS (
      SELECT s_acctbal, s_name, n_name, p_partkey, p_name, cost,
             MIN(cost) OVER (PARTITION BY p_partkey) AS min_cost
      FROM offers
      JOIN part     ON p_partkey   = l_partkey
      JOIN supplier ON s_suppkey   = l_suppkey
      JOIN nation   ON n_nationkey = s_nationkey
      JOIN region   ON r_regionkey = n_regionkey
      WHERE p_size BETWEEN 10 AND 20 AND p_type = 'STANDARD'
        AND r_name = 'AFRICA'
    )
    SELECT ROUND(s_acctbal, 2) AS acctbal, s_name, n_name,
           p_partkey, p_name, CAST(cost AS DOUBLE) AS supply_cost
    FROM ranked WHERE cost = min_cost
    ORDER BY acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    doc="TPC-H Q2 shape (partsupp→lineitem bridge): correlated min "
    "per part via window-min over the aggregated offer table; all "
    "four dims broadcast; LIMIT boundary made deterministic by the "
    "full tiebreaker chain.",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_size").between(10, 20) & (F.col("p_type") == "STANDARD")
    )
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "AFRICA")

    offers = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(_dec("l_extendedprice")).alias("cost")
    )
    joined = (
        offers.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(region), F.col("r_regionkey") == F.col("n_regionkey"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        joined.withColumn("min_cost", F.min("cost").over(w))
        .where(F.col("cost") == F.col("min_cost"))
        .select(
            F.round("s_acctbal", 2).alias("acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.col("cost").cast("double").alias("supply_cost"),
        )
        .orderBy(F.desc("acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# --------------------------------------------------------------------
# Q9 shape: profit by nation × order-year for a product family.
# p_retailprice stands in for ps_supplycost (no partsupp table).
# --------------------------------------------------------------------
@register(
    "q9_product_profit",
    oracle="""
    SELECT n_name AS nation, order_year,
           CAST(SUM(amount) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name, EXTRACT(year FROM o_orderdate) AS order_year,
             CAST(l_extendedprice AS DECIMAL(12,2))
               * CAST(1 - l_discount AS DECIMAL(12,2))
             - CAST(p_retailprice AS DECIMAL(12,2))
               * CAST(l_quantity AS DECIMAL(12,2)) AS amount
      FROM lineitem
      JOIN part     ON p_partkey   = l_partkey
      JOIN supplier ON s_suppkey   = l_suppkey
      JOIN nation   ON n_nationkey = s_nationkey
      JOIN orders   ON o_orderkey  = l_orderkey
      WHERE p_name LIKE '%bolt%'
    )
    GROUP BY nation, order_year
    """,
    doc="TPC-H Q9 shape: 5-way join, part filtered by name LIKE "
    "(broadcast, so the filter prunes lineitem at the join instead "
    "of a partkey IN-list scan), profit in exact decimals. One "
    "lineitem⋈orders shuffle; everything else broadcasts.",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%bolt%"))
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    # profit as an exact 4-dp integer micro: (price·(1−disc)) −
    # (retail·qty), both 2dp×2dp products — value-identical to the
    # decimal formulation, no BigDecimal agg buffer
    # (functions/money.py). Two-level over spark_partition_id(): the
    # (nation, year) groups are unbounded per group, so level 1 keeps
    # the long sums partition-bounded and level 2 re-sums the tiny
    # table in DECIMAL(38,0) (guide §2.5).
    amount = money_micro(F.col("l_extendedprice")) * money_micro(
        F.lit(1) - F.col("l_discount")
    ) - money_micro(F.col("p_retailprice")) * money_micro(F.col("l_quantity"))
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("order_year"),
            F.spark_partition_id().alias("_pid"),
        )
        .agg(F.sum(amount).alias("sprofit"))
        .groupBy("nation", "order_year")
        .agg(micro_sum_to_double(F.col("sprofit"), 10_000).alias("sum_profit"))
    )


# --------------------------------------------------------------------
# Q11 shape: parts whose value exceeds a fraction of the global total
# (scalar subquery over the same aggregate).
# --------------------------------------------------------------------
@register(
    "q11_important_parts",
    oracle="""
    WITH v AS (
      SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS val
      FROM lineitem
      JOIN supplier ON s_suppkey   = l_suppkey
      JOIN nation   ON n_nationkey = s_nationkey
      JOIN region   ON r_regionkey = n_regionkey
      WHERE r_name = 'AFRICA'
      GROUP BY l_partkey
    )
    SELECT l_partkey AS partkey, CAST(val AS DOUBLE) AS part_value
    FROM v
    WHERE CAST(val AS DOUBLE) >
          (SELECT CAST(SUM(val) AS DOUBLE) * 0.0005 FROM v)
    """,
    doc="TPC-H Q11 shape: per-part value vs a scalar-subquery "
    "fraction of the total. The per-part aggregate is computed once "
    "and reused for both sides (self-referencing CTE); Spark side "
    "caches nothing — the total is a 1-row broadcast cross join, so "
    "the big aggregation runs once per branch but AQE reuses the "
    "shuffle output (ReusedExchange) for the second read.",
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "AFRICA")
    # Per-part price sums as exact 2-dp micro longs (r15): the
    # per-part aggregate runs over the region-filtered bulk of
    # lineitem, so the DECIMAL(22,2) buffer was the dominant per-row
    # cost. Single-level is overflow-safe by structure: price micro
    # <= ~1e7, bound ~9e11 rows per part (ANSI throws beyond). The
    # threshold re-sums the per-part micro subtotals in DECIMAL(38,0)
    # (vocab-bounded rows), and both sides of the comparison convert
    # through the SAME exact-rational-to-double rounding the decimal
    # formulation used. Measured at sf0.1 (two interleaved cur-vs-ref
    # microbench rounds): 0.80/0.59 s -> 0.57/0.53 s medians
    # (OPTIMIZATION_r15.md).
    v = (
        li.join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(region), F.col("r_regionkey") == F.col("n_regionkey"))
        .groupBy("l_partkey")
        .agg(F.sum(money_micro(F.col("l_extendedprice"))).alias("vmicro"))
    )
    total = v.agg(
        (micro_sum_to_double(F.col("vmicro"), 100) * F.lit(0.0005)).alias(
            "threshold"
        )
    )
    return (
        v.join(F.broadcast(total))
        .where(micro_to_double(F.col("vmicro"), 100) > F.col("threshold"))
        .select(
            F.col("l_partkey").alias("partkey"),
            micro_to_double(F.col("vmicro"), 100).alias("part_value"),
        )
    )


# --------------------------------------------------------------------
# Q16 shape: distinct supplier counts per part-attribute triple with a
# NOT IN anti-subquery excluding "complaint" suppliers.
# --------------------------------------------------------------------
@register(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#45'
      AND p_type NOT LIKE 'PROMO%'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7%')
    GROUP BY p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 shape: NOT IN over a non-null key → planned as a "
    "broadcast left-anti join (100-row dim); part filter broadcast; "
    "COUNT(DISTINCT) is a two-phase partial-distinct aggregate, one "
    "shuffle on the group keys.",
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#45")
        & (~F.col("p_type").like("PROMO%"))
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    )
    complainers = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_name").like("%7%"))
        .select("s_suppkey")
    )
    return (
        li.join(
            F.broadcast(complainers),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------
# Q20 shape: suppliers holding an excess share of some part's shipped
# volume (nested aggregate threshold + semi chain + DISTINCT).
# --------------------------------------------------------------------
@register(
    "q20_excess_share_suppliers",
    oracle="""
    WITH pq AS (
      SELECT l_partkey, l_suppkey,
             SUM(CAST(l_quantity AS DECIMAL(12,2))) AS qty
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE 'small%'
        AND l_shipdate >= TIMESTAMP '1995-01-01'
        AND l_shipdate <  TIMESTAMP '1996-01-01'
      GROUP BY l_partkey, l_suppkey
    ), pt AS (
      SELECT l_partkey, SUM(qty) AS total_qty FROM pq GROUP BY l_partkey
    )
    SELECT DISTINCT s_name, ROUND(s_acctbal, 2) AS acctbal
    FROM pq
    JOIN pt USING (l_partkey)
    JOIN supplier ON s_suppkey   = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    JOIN region   ON r_regionkey = n_regionkey
    WHERE r_name = 'AFRICA'
      AND CAST(qty AS DOUBLE) > 0.5 * CAST(total_qty AS DOUBLE)
    """,
    doc="TPC-H Q20 shape: per-(part,supplier) 1995 shipped quantity "
    "vs half the per-part total. The total is a window-sum over the "
    "already-reduced offer table (|parts|×|suppliers| rows) instead "
    "of a second aggregate joined back — one repartition on partkey "
    "replaces the agg+join's two exchanges plus re-sorts (plan "
    "evidence: 5 data shuffles → 3, PLANS.md); region-filtered "
    "supplier dim broadcast; final DISTINCT dedups multi-part "
    "winners. Oracle keeps the self-join CTE spelling — identical "
    "results, independently derived.",
)
def q20_excess_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").where(F.col("p_name").like("small%"))
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "AFRICA")

    pq = (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(_dec("l_quantity")).alias("qty"))
    )
    per_part = Window.partitionBy("l_partkey")
    return (
        pq.withColumn("total_qty", F.sum("qty").over(per_part))
        .where(
            F.col("qty").cast("double")
            > F.lit(0.5) * F.col("total_qty").cast("double")
        )
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(region), F.col("r_regionkey") == F.col("n_regionkey"))
        .select("s_name", F.round("s_acctbal", 2).alias("acctbal"))
        .distinct()
    )
