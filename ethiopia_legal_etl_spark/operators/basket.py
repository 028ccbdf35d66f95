"""Market-basket association rules (Agrawal & Srikant, VLDB 1994
"Fast algorithms for mining association rules" — the Apriori support/
confidence/lift framework) over order baskets.

Basket = the set of DISTINCT part brands in one order; a rule
brand_a → brand_b is reported with support, confidence, and lift. The
plan is the distributed pair-counting shape, NOT an items self-join:
ONE aggregate on the basket key builds sorted brand arrays
(collect_set dedups in the partial), in-basket pairs are generated
map-side from the array (bounded by basket size², and TPC-H baskets
hold ≤7 lines), and the brand supports / basket count hang off the
SAME exchange (Spark ReusedExchange) — lineitem is scanned once. The
per-brand support table is tiny (25 rows, domain-bounded at 100 TB)
and joins back broadcast.

Every count is an exact BIGINT and every ratio is ONE division of
exact integers (lift's numerator/denominator are cleared of the
1/n factors: lift = n_both·n_baskets / (n_a·n_b)), so the whole rule
table is oracle-hash-checked with no tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ethiopia_legal_etl_spark.operators.registry import register
from ethiopia_legal_etl_spark.sources.tables import load_table

# report rules with support >= 1/1000 of baskets (relative threshold so
# the same rule set logic holds at every SF)
_SUP_DEN = 1000


@register(
    "assoc_rules_brand_pairs",
    oracle=f"""
    WITH items AS (
      SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    baskets AS (SELECT CAST(COUNT(DISTINCT okey) AS BIGINT) AS n_baskets
                FROM items),
    brand_sup AS (
      SELECT brand, CAST(COUNT(*) AS BIGINT) AS n_brand
      FROM items GROUP BY brand
    ),
    pairs AS (
      SELECT a.brand AS brand_a, b.brand AS brand_b,
             CAST(COUNT(*) AS BIGINT) AS n_both
      FROM items a JOIN items b
        ON a.okey = b.okey AND a.brand < b.brand
      GROUP BY a.brand, b.brand
    )
    SELECT p.brand_a, p.brand_b, p.n_both,
           sa.n_brand AS n_a, sb.n_brand AS n_b,
           t.n_baskets,
           CAST(p.n_both AS DOUBLE) / CAST(t.n_baskets AS DOUBLE)
             AS support,
           CAST(p.n_both AS DOUBLE) / CAST(sa.n_brand AS DOUBLE)
             AS confidence_a_b,
           CAST(p.n_both * t.n_baskets AS DOUBLE)
             / CAST(sa.n_brand * sb.n_brand AS DOUBLE) AS lift
    FROM pairs p
    JOIN brand_sup sa ON p.brand_a = sa.brand
    JOIN brand_sup sb ON p.brand_b = sb.brand
    CROSS JOIN baskets t
    WHERE p.n_both * {_SUP_DEN} >= t.n_baskets
    """,
    doc="Apriori-style association rules (Agrawal & Srikant VLDB'94) "
    "over order baskets of part brands: support / confidence / lift "
    "per unordered brand pair, min support 1/1000 of baskets "
    "(relative, so semantics are SF-stable). Distinct (order, brand) "
    "items, basket-key self-join for pair counts (bounded by basket "
    "size², never item-domain all-pairs), per-brand supports joined "
    "back broadcast. All counts BIGINT; each metric is one division "
    "of exact integers (lift cleared of 1/n factors) — the full rule "
    "table hash-checks with no tolerance.",
)
def assoc_rules_brand_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    # ONE aggregate builds the basket table (collect_set dedups brands
    # within an order); all three downstream consumers hang off the same
    # exchange, which Spark de-duplicates via ReusedExchange — no
    # self-join, no second scan of lineitem.
    baskets = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.col("l_orderkey").alias("okey"))
        .agg(F.array_sort(F.collect_set("p_brand")).alias("brands"))
    )
    n_baskets = baskets.agg(F.count(F.lit(1)).alias("n_baskets"))
    brand_sup = (
        baskets.select(F.explode("brands").alias("brand"))
        .groupBy("brand")
        .agg(F.count(F.lit(1)).alias("n_brand"))
    )
    # unordered in-basket pairs straight from the sorted array: element i
    # paired with every later element — map-side work bounded by basket
    # size squared, never an item-domain cross product
    pair_combos = F.flatten(
        F.transform(
            "brands",
            lambda x, i: F.transform(
                F.slice(F.col("brands"), i + 2, F.size("brands")),
                lambda y: F.struct(
                    x.alias("brand_a"), y.alias("brand_b")
                ),
            ),
        )
    )
    pairs = (
        baskets.select(F.explode(pair_combos).alias("p"))
        .groupBy(F.col("p.brand_a").alias("brand_a"), F.col("p.brand_b").alias("brand_b"))
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    sa = brand_sup.select(
        F.col("brand").alias("brand_a"), F.col("n_brand").alias("n_a")
    )
    sb = brand_sup.select(
        F.col("brand").alias("brand_b"), F.col("n_brand").alias("n_b")
    )
    out = (
        pairs.join(F.broadcast(sa), "brand_a")
        .join(F.broadcast(sb), "brand_b")
        .crossJoin(F.broadcast(n_baskets))
        .where(F.col("n_both") * _SUP_DEN >= F.col("n_baskets"))
    )
    return out.select(
        "brand_a",
        "brand_b",
        "n_both",
        "n_a",
        "n_b",
        "n_baskets",
        (F.col("n_both").cast("double") / F.col("n_baskets").cast("double")).alias(
            "support"
        ),
        (F.col("n_both").cast("double") / F.col("n_a").cast("double")).alias(
            "confidence_a_b"
        ),
        (
            (F.col("n_both") * F.col("n_baskets")).cast("double")
            / (F.col("n_a") * F.col("n_b")).cast("double")
        ).alias("lift"),
    )
