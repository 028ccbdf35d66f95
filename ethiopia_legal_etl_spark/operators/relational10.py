"""Wave 10: Spark 4 surface — collation-aware grouping, try_* safe
arithmetic, mode/any_value, skewness/kurtosis, IGNORE NULLS window
navigation, inline VALUES dimension, width_bucket histogram, exact
bitmap distinct counting, percentile_cont/disc WITHIN GROUP, and the
DataFrame.groupingSets API.

Reference parity: none of these exist in the reference (SURVEY.md §2.A
covers a sequential ETL script) — they are Layer-B engine surface from
SURVEY.md §2.B's "all public Spark APIs" mandate. Each query carries a
DuckDB oracle; dialect gaps (width_bucket, Spark's population-moment
skewness/kurtosis) are bridged by spelling the exact formula in the
oracle SQL rather than weakening the check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ethiopia_legal_etl_spark.operators.registry import register
from ethiopia_legal_etl_spark.functions.measures import EVENTS_FINITE_SQL, clean_measures
from ethiopia_legal_etl_spark.sources.tables import load_table


# --------------------------------------------------------------------
# Spark 4 collation: case-insensitive grouping without lower() rewrite.
# --------------------------------------------------------------------
@register(
    "collation_ci_priority_counts",
    oracle="""
    SELECT lower(CASE WHEN o_orderkey % 2 = 0 THEN lower(o_orderpriority)
                      ELSE o_orderpriority END) AS priority_ci,
           COUNT(*) AS cnt
    FROM orders
    GROUP BY 1
    """,
    doc="Spark 4 collation surface: half the keys are lower-cased, then "
    "grouped under COLLATE UTF8_LCASE so differently-cased spellings "
    "land in ONE group; the output canonicalizes with lower() because "
    "the group representative is whichever casing a partition saw "
    "first. DuckDB oracle groups by lower() directly. Scale: collation "
    "pushes case-insensitivity into the hash of the exchange itself — "
    "one shuffle, no double-aggregation, and (unlike lower() rewrites) "
    "it survives into joins/sorts as a column property.",
)
def collation_ci_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    mixed = F.when(
        F.col("o_orderkey") % 2 == 0, F.lower("o_orderpriority")
    ).otherwise(F.col("o_orderpriority"))
    return (
        orders.groupBy(F.collate(mixed, "UTF8_LCASE").alias("k"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.lower("k").alias("priority_ci"), "cnt")
    )


# --------------------------------------------------------------------
# try_* family: NULL-on-error arithmetic instead of job-killing throws.
# --------------------------------------------------------------------
@register(
    "try_arithmetic_orders",
    oracle="""
    SELECT o_orderkey,
           ROUND(CASE WHEN o_custkey % 7 = 0 THEN NULL
                      ELSE CAST(o_totalprice AS DOUBLE) / (o_custkey % 7) END,
                 6) AS safe_ratio,
           CASE WHEN o_orderkey > 7 THEN NULL
                ELSE o_orderkey + 9223372036854775800 END AS safe_sum,
           TRY_CAST(CASE WHEN o_orderkey % 3 = 0 THEN '12x'
                         ELSE CAST(o_custkey AS VARCHAR) END AS INTEGER)
             AS safe_int
    FROM orders
    WHERE o_custkey < 500
    """,
    doc="try_divide / try_add / try_cast: division by zero, bigint "
    "overflow, and malformed casts yield NULL instead of throwing — "
    "the semantics a 100 TB batch needs (one poisoned row must not "
    "kill a 10k-task stage; the NULLs stay auditable downstream, the "
    "per-record error-isolation story of SURVEY §2.C applied to "
    "arithmetic). DuckDB spells them as guarded CASE / TRY_CAST. "
    "Narrow per-row projection: no shuffle, pushed filter.",
)
def try_arithmetic_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") < 500)
    return orders.select(
        "o_orderkey",
        F.round(
            F.try_divide(
                F.col("o_totalprice").cast("double"),
                (F.col("o_custkey") % 7).cast("double"),
            ),
            6,
        ).alias("safe_ratio"),
        F.try_add(F.col("o_orderkey"), F.lit(9223372036854775800)).alias(
            "safe_sum"
        ),
        F.when(F.col("o_orderkey") % 3 == 0, F.lit("12x"))
        .otherwise(F.col("o_custkey").cast("string"))
        .try_cast("int")
        .alias("safe_int"),
    )


# --------------------------------------------------------------------
# mode() / any_value(): most-frequent-value and arbitrary-pick aggs.
# --------------------------------------------------------------------
@register(
    "mode_any_value_linestatus",
    oracle="""
    SELECT l_returnflag AS flag,
           mode(l_linestatus) AS mode_status,
           upper(l_returnflag) AS flag_upper,
           COUNT(*) AS cnt
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="mode() most-frequent aggregate + any_value() arbitrary pick "
    "(deterministic here because the picked expression is constant per "
    "group; mode is tie-free on this data at every SF — verified "
    "0.001/0.01/0.1). any_value is the cheap escape hatch for "
    "functionally-dependent columns that would otherwise force a "
    "redundant GROUP BY key. Scale: both are single-pass hash "
    "aggregates with map-side partials; mode keeps a per-key frequency "
    "map, so high-cardinality value domains belong in groupBy form.",
)
def mode_any_value_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.mode("l_linestatus").alias("mode_status"),
        F.any_value(F.upper("l_returnflag")).alias("flag_upper"),
        F.count(F.lit(1)).alias("cnt"),
    )


# --------------------------------------------------------------------
# Higher central moments: skewness / kurtosis.
# --------------------------------------------------------------------
@register(
    "stats_skew_kurtosis",
    oracle="""
    WITH m AS (
      SELECT l_returnflag AS flag, AVG(CAST(l_quantity AS DOUBLE)) AS mu
      FROM lineitem GROUP BY 1
    ),
    c AS (
      SELECT l.l_returnflag AS flag,
             AVG(POW(CAST(l.l_quantity AS DOUBLE) - m.mu, 2)) AS m2,
             AVG(POW(CAST(l.l_quantity AS DOUBLE) - m.mu, 3)) AS m3,
             AVG(POW(CAST(l.l_quantity AS DOUBLE) - m.mu, 4)) AS m4
      -- null-SAFE join: a NULL returnflag is a GROUP (Spark's groupBy
      -- keeps it); an equi-join here would silently drop it (caught
      -- by the r9 full null-mirror sweep)
      FROM lineitem l JOIN m ON l.l_returnflag IS NOT DISTINCT FROM m.flag
      GROUP BY 1
    )
    SELECT flag,
           ROUND(m3 / POW(m2, 1.5), 4) + 0 AS skew_qty,
           ROUND(m4 / (m2 * m2) - 3, 4) + 0 AS kurt_qty
    FROM c
    """,
    doc="skewness/kurtosis aggregates (population central-moment form: "
    "g1 = m3/m2^1.5, excess g2 = m4/m2^2 - 3). DuckDB's builtins use "
    "the SAMPLE-corrected estimators, so the oracle spells Spark's "
    "definition via explicit moments instead — two-pass AVG(POW(x-mu)) "
    "vs Spark's single-pass streaming moments agree to ~1e-12, "
    "absorbed by ROUND(4); `+ 0` canonicalizes IEEE -0.0. Scale: "
    "Spark's implementation is one partial-aggregable pass (merged "
    "moment sketches per partition) — strictly better than the "
    "oracle's two-scan join, which is why the engine side is the "
    "builtin, not the formula.",
)
def stats_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(F.col("l_returnflag").alias("flag")).agg(
        (F.round(F.skewness(F.col("l_quantity").cast("double")), 4) + F.lit(0)).alias(
            "skew_qty"
        ),
        (F.round(F.kurtosis(F.col("l_quantity").cast("double")), 4) + F.lit(0)).alias(
            "kurt_qty"
        ),
    )


# --------------------------------------------------------------------
# Window navigation with IGNORE NULLS + cume_dist.
# --------------------------------------------------------------------
@register(
    "window_ignore_nulls_last_purchase",
    oracle="""
    SELECT event_id, user_id,
           last_value(pv IGNORE NULLS) OVER w AS last_purchase_value,
           first_value(pv IGNORE NULLS) OVER w AS first_purchase_value,
           ROUND(cume_dist() OVER (PARTITION BY user_id ORDER BY event_id), 6)
             AS pos_frac
    FROM (SELECT event_id, user_id,
                 CASE WHEN event_type = 'purchase' THEN value END AS pv
          FROM events)
    WINDOW w AS (PARTITION BY user_id ORDER BY event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    doc="IGNORE NULLS navigation: per user, the most recent and the "
    "earliest purchase value seen so far (non-purchase rows are NULL "
    "and skipped, the LOCF shape without a join), plus cume_dist "
    "position. Ordering is by event_id, not ts — the engine stores "
    "events at µs while DuckDB keeps ns, so a ts ORDER BY could tie "
    "differently across engines (SURVEY §2.C trap). Scale: one "
    "shuffle on user_id, sort within partitions; frames are "
    "running-accumulator, no O(n²) re-scan.",
)
def window_ignore_nulls_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pv = F.when(F.col("event_type") == "purchase", F.col("value"))
    base = ev.select("event_id", "user_id", pv.alias("pv"))
    base.createOrReplaceTempView("v_events_ign")
    return spark.sql(
        """
        SELECT event_id, user_id,
               last_value(pv) IGNORE NULLS OVER w AS last_purchase_value,
               first_value(pv) IGNORE NULLS OVER w AS first_purchase_value,
               ROUND(cume_dist() OVER (PARTITION BY user_id ORDER BY event_id), 6)
                 AS pos_frac
        FROM v_events_ign
        WINDOW w AS (PARTITION BY user_id ORDER BY event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        """
    )


# --------------------------------------------------------------------
# Inline VALUES dimension + broadcast join.
# --------------------------------------------------------------------
_TIERS = [
    ("1-URGENT", "critical"),
    ("2-HIGH", "critical"),
    ("3-MEDIUM", "standard"),
    ("4-NOT SPECIFIED", "relaxed"),
    ("5-LOW", "relaxed"),
]


@register(
    "values_inline_priority_tier",
    oracle="""
    SELECT t.tier,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
    FROM orders o
    JOIN (VALUES ('1-URGENT','critical'), ('2-HIGH','critical'),
                 ('3-MEDIUM','standard'), ('4-NOT SPECIFIED','relaxed'),
                 ('5-LOW','relaxed')) t(priority, tier)
      ON o.o_orderpriority = t.priority
    GROUP BY t.tier
    """,
    doc="inline VALUES dimension: a 5-row driver-local mapping table "
    "(priority -> SLA tier) broadcast-joined to orders, then "
    "aggregated. The canonical enrich-with-tiny-lookup shape — at "
    "100 TB the dim stays a broadcast (no shuffle of the fact side "
    "for the join; the only exchange is the post-join tier "
    "aggregation, pre-reduced map-side). Money policy: exact DECIMAL "
    "sum cast to DOUBLE at the end.",
)
def values_inline_priority_tier(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    tiers = spark.createDataFrame(_TIERS, "priority string, tier string")
    return (
        orders.join(
            F.broadcast(tiers), orders.o_orderpriority == tiers.priority
        )
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )


# --------------------------------------------------------------------
# width_bucket histogram binning.
# --------------------------------------------------------------------
@register(
    "width_bucket_price_histogram",
    oracle="""
    SELECT CASE WHEN o_totalprice < 0.0 THEN 0
                WHEN o_totalprice >= 600000.0 THEN 8
                ELSE CAST(FLOOR((o_totalprice - 0.0) / ((600000.0 - 0.0) / 7))
                          AS BIGINT) + 1 END AS bucket,
           COUNT(*) AS cnt,
           CAST(MIN(o_totalprice) AS DOUBLE) AS lo_price,
           CAST(MAX(o_totalprice) AS DOUBLE) AS hi_price
    FROM orders
    GROUP BY 1
    """,
    doc="width_bucket equi-width histogram: order prices into 7 "
    "buckets over [0, 600000) with under/overflow buckets 0 and 8. "
    "DuckDB has no width_bucket, so the oracle spells Spark's exact "
    "formula (floor((v-lo)/((hi-lo)/n))+1 — verified 0 mismatches "
    "against the builtin on real data; n=7 keeps bucket edges "
    "non-terminating so no 2-decimal price can sit on a boundary). "
    "Scale: a histogram is the projection every profiler/optimizer "
    "wants — single map-side-combined shuffle of ≤n+2 groups, and the "
    "bucket expression vectorizes in whole-stage codegen.",
)
def width_bucket_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.width_bucket(
                "o_totalprice", F.lit(0.0), F.lit(600000.0), F.lit(7)
            ).alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("o_totalprice").cast("double").alias("lo_price"),
            F.max("o_totalprice").cast("double").alias("hi_price"),
        )
    )


# --------------------------------------------------------------------
# Exact distinct counting via bitmap aggregates (mergeable).
# --------------------------------------------------------------------
@register(
    "bitmap_distinct_users_daily",
    oracle="""
    SELECT CAST(ts AS DATE) AS day,
           COUNT(DISTINCT user_id) AS distinct_users
    FROM events
    GROUP BY 1
    """,
    doc="EXACT distinct counting with bitmap aggregates: user ids are "
    "bucketed (bitmap_bucket_number), each (day, bucket) builds a "
    "fixed-width bitmap (bitmap_construct_agg of bit positions), and "
    "per-day distinct = SUM of per-bucket bitmap_count. The exact "
    "complement to the HLL sketch rollup (sketch_hll_daily_users): "
    "same mergeable-partial shape — bitmaps OR-combine map-side, so "
    "the shuffle carries one ≤4KB bitmap per (day,bucket), not one "
    "row per user — but with zero error. At 100 TB this is the "
    "pattern for exact COUNT(DISTINCT) over billions of int keys "
    "without expand-based multi-phase distinct aggregation.",
)
def bitmap_distinct_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_bucket = ev.select(
        F.to_date("ts").alias("day"),
        F.expr("bitmap_bucket_number(user_id)").alias("bucket"),
        F.expr("bitmap_bit_position(user_id)").alias("pos"),
    ).groupBy("day", "bucket").agg(
        F.expr("bitmap_count(bitmap_construct_agg(pos))").alias("bucket_cnt")
    )
    return per_bucket.groupBy("day").agg(
        F.sum("bucket_cnt").alias("distinct_users")
    )


# --------------------------------------------------------------------
# percentile_cont / percentile_disc WITHIN GROUP.
# --------------------------------------------------------------------
@register(
    "percentile_within_group_prices",
    oracle="""
    SELECT o_orderpriority AS priority,
           ROUND(percentile_cont(0.25) WITHIN GROUP
                 (ORDER BY CAST(o_totalprice AS DOUBLE)), 4) AS p25,
           ROUND(percentile_cont(0.50) WITHIN GROUP
                 (ORDER BY CAST(o_totalprice AS DOUBLE)), 4) AS p50,
           ROUND(percentile_cont(0.75) WITHIN GROUP
                 (ORDER BY CAST(o_totalprice AS DOUBLE)), 4) AS p75,
           CAST(percentile_disc(0.50) WITHIN GROUP
                (ORDER BY CAST(o_totalprice AS DOUBLE)) AS DOUBLE) AS p50_disc
    FROM orders
    GROUP BY 1
    """,
    doc="ANSI ordered-set aggregates: interpolated quartiles "
    "(percentile_cont) and the actual-row median (percentile_disc) "
    "per priority — identical WITHIN GROUP syntax on both engines. "
    "Interpolation of 2-decimal prices at quartile fractions has ≤4 "
    "exact decimals, so ROUND(4) is tie-free (float policy). Exact "
    "percentiles need the group's values together — one shuffle, "
    "per-group sort; at scale prefer approx_percentile (see "
    "approx_percentile_price) unless exactness is contractual.",
)
def percentile_within_group_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("v_orders_pct")
    return spark.sql(
        """
        SELECT o_orderpriority AS priority,
               ROUND(percentile_cont(0.25) WITHIN GROUP
                     (ORDER BY CAST(o_totalprice AS DOUBLE)), 4) AS p25,
               ROUND(percentile_cont(0.50) WITHIN GROUP
                     (ORDER BY CAST(o_totalprice AS DOUBLE)), 4) AS p50,
               ROUND(percentile_cont(0.75) WITHIN GROUP
                     (ORDER BY CAST(o_totalprice AS DOUBLE)), 4) AS p75,
               CAST(percentile_disc(0.50) WITHIN GROUP
                    (ORDER BY CAST(o_totalprice AS DOUBLE)) AS DOUBLE)
                 AS p50_disc
        FROM v_orders_pct
        GROUP BY o_orderpriority
        """
    )


# --------------------------------------------------------------------
# DataFrame.groupingSets API (Spark 4) — the typed twin of the SQL form.
# --------------------------------------------------------------------
@register(
    "df_groupingsets_region_nation",
    oracle="""
    SELECT r_name, n_name,
           COUNT(*) AS n_suppliers,
           CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS acctbal,
           GROUPING(r_name) AS g_region,
           GROUPING(n_name) AS g_nation
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())
    """,
    doc="DataFrame.groupingSets (Spark 4): region+nation detail, "
    "region subtotal, and grand total in ONE aggregation pass over "
    "the broadcast-enriched supplier table — the typed-API twin of "
    "sql_grouping_sets, with grouping() markers disambiguating real "
    "NULL keys from subtotal rows. Scale: grouping sets expand rows "
    "by |sets| BEFORE the exchange but partials still combine "
    "map-side; for high-cardinality set lists prefer unioned "
    "aggregations over one mega-expand.",
)
def df_groupingsets_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    enriched = sup.join(
        F.broadcast(nat), sup.s_nationkey == nat.n_nationkey
    ).join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
    return enriched.groupingSets(
        [["r_name", "n_name"], ["r_name"], []], "r_name", "n_name"
    ).agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum(F.col("s_acctbal").cast("decimal(12,2)"))
        .cast("double")
        .alias("acctbal"),
        F.grouping("r_name").cast("int").alias("g_region"),
        F.grouping("n_name").cast("int").alias("g_nation"),
    )


@register(
    "median_ci_order_stats",
    oracle=f"""
    WITH v AS (
      SELECT event_type, value,
             ROW_NUMBER() OVER (
               PARTITION BY event_type ORDER BY value, event_id
             ) AS rk,
             CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
      FROM {EVENTS_FINITE_SQL} WHERE value IS NOT NULL
    ),
    ranks AS (
      SELECT event_type, value, rk, n,
             CAST(FLOOR((n - 1.959964 * SQRT(CAST(n AS DOUBLE))) / 2)
               AS BIGINT) AS k_lo
      FROM v
    )
    SELECT event_type,
           MAX(n) AS n,
           MAX(k_lo) AS k_lo,
           MAX(n) + 1 - MAX(k_lo) AS k_hi,
           MAX(CASE WHEN rk = k_lo THEN value END) AS ci_lo,
           MAX(CASE WHEN rk = n + 1 - k_lo THEN value END) AS ci_hi,
           MEDIAN(value) AS med
    FROM ranks GROUP BY event_type
    """,
    doc="DISTRIBUTION-FREE 95% CONFIDENCE INTERVAL FOR THE MEDIAN via "
    "order statistics (the binomial/sign-test interval, normal "
    "approximation k = floor((n - z*sqrt(n))/2), z = 1.959964; "
    "Conover, Practical Nonparametric Statistics): the CI endpoints "
    "are the k-th and (n+1-k)-th ORDER STATISTICS per event_type — "
    "no distributional assumption, no bootstrap RNG, and therefore "
    "exactly reproducible cross-engine: the rank k is one "
    "deterministic IEEE expression of the exact BIGINT n (sqrt is "
    "correctly-rounded everywhere), the endpoints are exact selected "
    "values, and the point estimate reuses the engines' agreeing "
    "interpolated MEDIAN on DOUBLE (median_bool_flags parity note). "
    "Completes the inference family: stats_chi2_independence "
    "(association), drift_ks_two_sample (distribution equality), "
    "retention_kaplan_meier (survival) — this is interval estimation. "
    "Scale: one partitioned rank window per group (the grouped-rank "
    "shape); nothing global.",
)
def median_ci_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = clean_measures(
        # raw-column null prefilter keeps IsNotNull(value) PUSHED to
        # the scan (the entry drops null measures anyway); the
        # cleaned non-finites become NULL and fall to the same filter
        load_table(spark, sf_dir, "events").where(
            F.col("value").isNotNull()
        ),
        "value",
    ).where(
        F.col("value").isNotNull()
    )
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    v = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    k_lo = F.floor(
        (F.col("n") - 1.959964 * F.sqrt(F.col("n").cast("double"))) / 2
    ).cast("long")
    ranks = v.withColumn("k_lo", k_lo)
    return ranks.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.max("k_lo").alias("k_lo"),
        (F.max("n") + 1 - F.max("k_lo")).alias("k_hi"),
        F.max(F.when(F.col("rk") == F.col("k_lo"), F.col("value"))).alias(
            "ci_lo"
        ),
        F.max(
            F.when(F.col("rk") == F.col("n") + 1 - F.col("k_lo"), F.col("value"))
        ).alias("ci_hi"),
        F.median("value").alias("med"),
    )
