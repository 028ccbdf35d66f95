"""Wave 13: the remaining built-in function families the registry had
not yet exercised —

- the full MAP higher-order surface (`map_from_entries`,
  `map_zip_with`, `transform_keys`, `transform_values`, `map_filter`,
  `map_entries`) composed in one per-user profile query;
- second string-scalar family: `split_part`, `initcap`, `translate`,
  `overlay`, `regexp_count` (DuckDB lacks initcap/overlay — the oracle
  emulates them with list lambdas / substr splicing, validated
  expression-by-expression during construction);
- second date-scalar family: `make_date`, `next_day`, `last_day`,
  `months_between`, `weekofyear`, `quarter` (next_day emulated in
  DuckDB via ISO-dow arithmetic; months_between applied to
  month-aligned dates so both engines produce the same integer);
- bitwise aggregates `bit_and`/`bit_or`/`bit_xor` under CUBE with
  `grouping_id()` (DuckDB spells it 2*GROUPING(a)+GROUPING(b)).

Reference parity note: the reference computes none of these
(SURVEY.md §2.A "explicitly absent"); Layer-B surface.

Scale notes: the scalar families are pure row-local projections —
whole-stage-codegen, zero shuffles, scan-bound at any scale. The map
profile reduces events to |users|×|types| before building any map, so
map construction cost is dimension-sized; the CUBE expands 4 grouping
sets in one shuffle (Spark's Expand operator).
"""

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ethiopia_legal_etl_spark.operators.registry import register
from ethiopia_legal_etl_spark.functions.measures import EVENTS_FINITE_SQL, clean_measures
from ethiopia_legal_etl_spark.sources.tables import load_table


# --------------------------------------------------------------------
# String scalar family 2.
# --------------------------------------------------------------------
@register(
    "scalar_string_funcs2",
    oracle="""
    SELECT p_partkey,
           split_part(p_name, ' ', 1) AS first_word,
           array_to_string(list_transform(string_split(p_name, ' '),
               x -> upper(x[1:1]) || lower(x[2:])), ' ') AS name_title,
           translate(p_name, 'aeiou', 'AEIOU') AS vowels_upper,
           substr(p_name, 1, 1) || 'XX' || substr(p_name, 4) AS spliced,
           length(regexp_extract_all(p_name, '[aeiou]')) AS vowel_cnt
    FROM part
    """,
    doc="split_part / initcap / translate / overlay / regexp_count in "
    "one projection. DuckDB has no initcap or overlay: the oracle "
    "rebuilds initcap with a per-word list lambda and overlay with "
    "substr splicing — independent spellings, identical values. Pure "
    "codegen projection: no shuffle, scan-bound at any scale.",
)
def scalar_string_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("first_word"),
        F.initcap("p_name").alias("name_title"),
        F.translate("p_name", "aeiou", "AEIOU").alias("vowels_upper"),
        F.overlay(F.col("p_name"), F.lit("XX"), F.lit(2), F.lit(2)).alias(
            "spliced"
        ),
        F.regexp_count(F.col("p_name"), F.lit("[aeiou]")).alias("vowel_cnt"),
    )


# --------------------------------------------------------------------
# Date scalar family 2.
# --------------------------------------------------------------------
@register(
    "scalar_date_funcs2",
    oracle="""
    SELECT o_orderkey,
           make_date(CAST(EXTRACT(year FROM o_orderdate) AS INTEGER),
                     CAST(EXTRACT(month FROM o_orderdate) AS INTEGER),
                     CAST(EXTRACT(day FROM o_orderdate) AS INTEGER))
             AS rebuilt_date,
           CAST(o_orderdate AS DATE)
             + CAST((7 + 6 - isodow(CAST(o_orderdate AS DATE))) % 7
                    AS INTEGER)
             + CASE WHEN (7 + 6 - isodow(CAST(o_orderdate AS DATE))) % 7 = 0
                    THEN 7 ELSE 0 END AS next_saturday,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           CAST(DATEDIFF('month', DATE '1992-01-01',
                         CAST(DATE_TRUNC('month', o_orderdate) AS DATE))
                AS DOUBLE) AS months_since_1992,
           week(CAST(o_orderdate AS DATE)) AS iso_week,
           quarter(CAST(o_orderdate AS DATE)) AS qtr
    FROM orders
    """,
    doc="make_date / next_day / last_day / months_between / weekofyear "
    "/ quarter. next_day has no DuckDB twin — the oracle derives the "
    "strictly-next Saturday from ISO day-of-week arithmetic. "
    "months_between is evaluated on month-aligned dates so its "
    "31-day-month fraction rule degenerates to the integer both "
    "engines agree on. Pure codegen projection: no shuffle.",
)
def scalar_date_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return orders.select(
        "o_orderkey",
        F.make_date(F.year(d), F.month(d), F.dayofmonth(d)).alias("rebuilt_date"),
        F.next_day(d, "Sat").alias("next_saturday"),
        F.last_day(d).alias("month_end"),
        F.months_between(
            F.date_trunc("month", "o_orderdate").cast("date"),
            F.lit("1992-01-01").cast("date"),
        ).alias("months_since_1992"),
        F.weekofyear(d).alias("iso_week"),
        F.quarter(d).alias("qtr"),
    )


# --------------------------------------------------------------------
# Map higher-order functions: per-user event-type profile.
# --------------------------------------------------------------------
@register(
    "map_hof_event_profile",
    oracle=f"""
    WITH per AS (
      -- null map keys are illegal in Spark (map_ops_user_stats
      -- precedent): null event types excluded on BOTH sides (caught
      -- by the r9 full null-mirror sweep)
      SELECT user_id, event_type, COUNT(*) AS cnt,
             SUM(CAST(value AS DECIMAL(14,2))) AS sumv
      FROM {EVENTS_FINITE_SQL} WHERE event_type IS NOT NULL
      GROUP BY user_id, event_type
    ), tot AS (
      SELECT user_id, event_type, cnt, sumv,
             SUM(cnt) OVER (PARTITION BY user_id) AS total
      FROM per
    )
    SELECT user_id, UPPER(event_type) AS etype, cnt,
           CAST(sumv AS DOUBLE) / cnt AS avg_value,
           CAST(cnt AS DOUBLE) / total AS share
    FROM tot
    WHERE CAST(cnt AS DOUBLE) / total >= 0.15
    """,
    doc="the whole map-HOF surface in one flow: per-user (type→count) "
    "and (type→sum) maps via map_from_entries(collect_list(struct)), "
    "combined with map_zip_with into (cnt, avg, share) structs (raw "
    "double divisions per the registry float policy — identical "
    "dividends on both engines, no round-tie surface), "
    "thinned with map_filter (share ≥ 0.15), keys rewritten with "
    "transform_keys(upper), then map_entries+explode back to rows. "
    "The maps are built AFTER the (user,type) reduction, so each map "
    "holds ≤5 entries regardless of event volume; the oracle computes "
    "the same numbers relationally, never touching a map.",
)
def map_hof_event_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = clean_measures(load_table(spark, sf_dir, "events"), "value")
    # null map keys are illegal in Spark ([NULL_MAP_KEY]) — null event
    # types excluded on both sides, the map_ops_user_stats precedent
    per = ev.where(F.col("event_type").isNotNull()).groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col("value").cast("decimal(14,2)")).alias("sumv"),
    )
    maps = per.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "cnt"))
        ).alias("cnt_map"),
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "sumv"))
        ).alias("sum_map"),
        F.sum("cnt").alias("total"),
    )
    profile = F.map_zip_with(
        "cnt_map",
        "sum_map",
        lambda k, c, s: F.struct(
            c.alias("cnt"),
            (s.cast("double") / c).alias("avg_value"),
            (c.cast("double") / F.col("total")).alias("share"),
        ),
    )
    thinned = F.map_filter(profile, lambda k, v: v["share"] >= 0.15)
    upper = F.transform_keys(thinned, lambda k, v: F.upper(k))
    return (
        maps.select("user_id", F.explode(F.map_entries(upper)).alias("e"))
        .select(
            "user_id",
            F.col("e.key").alias("etype"),
            F.col("e.value.cnt").alias("cnt"),
            F.col("e.value.avg_value").alias("avg_value"),
            F.col("e.value.share").alias("share"),
        )
    )


# --------------------------------------------------------------------
# Bitwise aggregates under CUBE with grouping_id.
# --------------------------------------------------------------------
@register(
    "bit_cube_flags",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           2 * GROUPING(l_returnflag) + GROUPING(l_linestatus)
             AS grouping_lvl,
           bit_and(l_suppkey) AS and_supp,
           bit_or(l_suppkey)  AS or_supp,
           bit_xor(l_suppkey) AS xor_supp,
           COUNT(*) AS cnt
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="bit_and / bit_or / bit_xor under a two-column CUBE with "
    "grouping_id() (DuckDB spelling: 2*GROUPING(a)+GROUPING(b) — the "
    "same bit encoding). The CUBE runs as one Expand + one shuffle; "
    "bitwise aggregates combine associatively, so partial aggregation "
    "applies map-side like any sum.",
)
def bit_cube_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping_id().alias("grouping_lvl"),
        F.bit_and("l_suppkey").alias("and_supp"),
        F.bit_or("l_suppkey").alias("or_supp"),
        F.bit_xor("l_suppkey").alias("xor_supp"),
        F.count(F.lit(1)).alias("cnt"),
    )
