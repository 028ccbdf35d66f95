"""Wave 8: Spark 4 SQL/API surfaces — recursive CTEs, SQL scripting
(BEGIN/DECLARE/END control flow), DataFrame.transpose, and the
Arrow-native mapInArrow UDF path.

All Layer-B engine surface (the reference has no SQL at all, SURVEY.md
§2.A "explicitly absent" list). The recursive CTE and scripting
queries run the IDENTICAL SQL text on Spark and DuckDB-equivalent
forms, pinning dialect-level parity, not just result parity.
"""

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ethiopia_legal_etl_spark.operators.registry import register
from ethiopia_legal_etl_spark.functions.measures import EVENTS_FINITE_SQL, clean_measures
from ethiopia_legal_etl_spark.sources.tables import load_table

_RECURSIVE_SPINE_SQL = """
WITH RECURSIVE months(m) AS (
  SELECT CAST('1995-01-01' AS DATE)
  UNION ALL
  SELECT CAST(m + INTERVAL 1 MONTH AS DATE) FROM months
  WHERE m < CAST('2001-08-01' AS DATE)
),
monthly AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
         COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue
  FROM orders GROUP BY 1
)
SELECT months.m AS month, COALESCE(n_orders, 0) AS n_orders, revenue
FROM months LEFT JOIN monthly ON months.m = monthly.m
"""


@register(
    "recursive_monthly_spine",
    oracle=_RECURSIVE_SPINE_SQL,
    doc="WITH RECURSIVE month spine (Spark 4 recursive CTE) left-joined "
    "to monthly order aggregates — the recursive sibling of "
    "timeseries_gapfill_locf's sequence() spine; months with no orders "
    "surface as zero rows instead of disappearing. The EXACT same SQL "
    "text runs on DuckDB as the oracle: dialect-level parity. "
    "Termination is structural (monotone month, bounded above). Scale: "
    "recursion produces 80 driver-side rows then joins the distributed "
    "aggregate — recursion depth never touches the big table.",
)
def recursive_monthly_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_RECURSIVE_SPINE_SQL)


_SCRIPT_SQL = """
BEGIN
  DECLARE cutoff DOUBLE DEFAULT 0;
  SET cutoff = (SELECT CAST(avg(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE)
                FROM orders);
  SELECT o_orderpriority,
         COUNT(*) AS n_above_avg,
         CAST(MIN(o_totalprice) AS DOUBLE) AS min_price
  FROM orders WHERE o_totalprice > cutoff
  GROUP BY o_orderpriority;
END
"""


@register(
    "scripting_above_avg_orders",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_above_avg,
           CAST(MIN(o_totalprice) AS DOUBLE) AS min_price
    FROM orders
    WHERE o_totalprice > (
      SELECT CAST(avg(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE)
      FROM orders)
    GROUP BY o_orderpriority
    """,
    doc="SQL scripting (Spark 4.1 BEGIN/DECLARE/SET/END): a session "
    "variable captures a scalar aggregate, the final statement filters "
    "on it; the script's result is the last SELECT. Oracle is the "
    "equivalent single-statement scalar subquery — proving the "
    "procedural form computes exactly the declarative answer. avg is "
    "decimal-sum/count per the float policy so both engines divide "
    "identical doubles.",
)
def scripting_above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_SCRIPT_SQL)


@register(
    "transpose_nation_metrics",
    oracle="""
    WITH per_region AS (
      SELECT r_name,
             CAST(COUNT(*) AS DOUBLE) AS n_nations,
             CAST(MIN(n_nationkey) AS DOUBLE) AS min_key,
             CAST(MAX(n_nationkey) AS DOUBLE) AS max_key
      FROM nation JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name
    )
    SELECT 'n_nations' AS key,
           MAX(CASE WHEN r_name = 'AFRICA' THEN n_nations END) AS "AFRICA",
           MAX(CASE WHEN r_name = 'AMERICA' THEN n_nations END) AS "AMERICA",
           MAX(CASE WHEN r_name = 'ASIA' THEN n_nations END) AS "ASIA",
           MAX(CASE WHEN r_name = 'EUROPE' THEN n_nations END) AS "EUROPE",
           MAX(CASE WHEN r_name = 'MIDDLE EAST' THEN n_nations END) AS "MIDDLE EAST"
    FROM per_region
    UNION ALL
    SELECT 'min_key',
           MAX(CASE WHEN r_name = 'AFRICA' THEN min_key END),
           MAX(CASE WHEN r_name = 'AMERICA' THEN min_key END),
           MAX(CASE WHEN r_name = 'ASIA' THEN min_key END),
           MAX(CASE WHEN r_name = 'EUROPE' THEN min_key END),
           MAX(CASE WHEN r_name = 'MIDDLE EAST' THEN min_key END)
    FROM per_region
    UNION ALL
    SELECT 'max_key',
           MAX(CASE WHEN r_name = 'AFRICA' THEN max_key END),
           MAX(CASE WHEN r_name = 'AMERICA' THEN max_key END),
           MAX(CASE WHEN r_name = 'ASIA' THEN max_key END),
           MAX(CASE WHEN r_name = 'EUROPE' THEN max_key END),
           MAX(CASE WHEN r_name = 'MIDDLE EAST' THEN max_key END)
    FROM per_region
    """,
    doc="DataFrame.transpose (Spark 4): a 5-region × 3-metric summary "
    "flipped so metrics become rows and regions become columns — the "
    "report-shaping dual of pivot. Metrics pre-cast to a common DOUBLE "
    "type (transpose requires a least-common type across the row). "
    "Oracle spells the transpose as conditional aggregation per region "
    "name. Driver-safe: transpose collects the FIRST column only to "
    "name output columns; the 5-row input here makes that trivial.",
)
def transpose_nation_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    per_region = (
        nation.join(
            F.broadcast(region),
            nation.n_regionkey == region.r_regionkey,
        )
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n_nations"),
            F.min("n_nationkey").cast("double").alias("min_key"),
            F.max("n_nationkey").cast("double").alias("max_key"),
        )
        .orderBy("r_name")
    )
    return per_region.transpose()


@register(
    "arrow_token_count",
    oracle="""
    SELECT doc_id,
           CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)
             AS n_tokens_ws
    FROM documents
    """,
    doc="mapInArrow (Spark 4 Arrow-native batch UDF): whitespace token "
    "counts computed with pyarrow.compute kernels on RecordBatches — "
    "no pandas materialization, no per-row Python. The zero-copy tier "
    "of the UDF ladder (built-ins > mapInArrow > pandas_udf > row "
    "UDF); oracle is the pure-SQL length-difference spelling, proving "
    "the Arrow kernel path computes exactly what the JVM expression "
    "would.",
)
def arrow_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def count_tokens(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            text = batch.column(1)
            spaces = pc.count_substring(text, " ")
            yield pa.RecordBatch.from_arrays(
                [batch.column(0), pc.add(spaces, 1).cast(pa.int64())],
                ["doc_id", "n_tokens_ws"],
            )

    return docs.mapInArrow(count_tokens, "doc_id long, n_tokens_ws long")


@register(
    "grouped_agg_weighted_price",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice * l_discount) / SUM(l_discount), 4)
             AS disc_weighted_price,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="GROUPED_AGG pandas UDF: discount-weighted mean price per "
    "return flag, the one UDF variant the other queries don't cover "
    "(scalar pandas_udf -> relational2, grouped-map applyInPandas -> "
    "relational4, mapInPandas -> ingest, mapInArrow -> arrow_token_"
    "count). The UDF receives each group's columns as whole pandas "
    "Series and returns one scalar; usable in groupBy().agg and as a "
    "window aggregate. Scale note: unlike built-in aggs there is NO "
    "map-side partial aggregation — every group's rows ship to one "
    "task — so built-ins stay preferred in hot paths; this exists for "
    "genuinely non-SQL group reductions. Oracle is the declarative "
    "weighted-mean spelling (4dp round absorbs double summation-order "
    "differences).",
)
def grouped_agg_weighted_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def wmean(price: pd.Series, disc: pd.Series) -> float:
        return float((price * disc).sum() / disc.sum())

    # Spark disallows mixing GROUPED_AGG UDFs with built-in aggregates
    # in one agg() (INVALID_PANDAS_UDF_PLACEMENT) -> count via a second
    # pandas aggregate
    @pandas_udf("long")
    def n_rows(price: pd.Series) -> int:
        return int(len(price))

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(wmean("l_extendedprice", "l_discount"), 4).alias(
            "disc_weighted_price"
        ),
        n_rows("l_extendedprice").alias("n_rows"),
    )


_PAGINATION_SQL = """
SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS total_price
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20 OFFSET 40
"""


@register(
    "pagination_offset_orders",
    oracle=_PAGINATION_SQL,
    doc="keyset-free pagination: ORDER BY ... LIMIT 20 OFFSET 40 (page "
    "3 of the priciest orders), identical SQL text on both engines. "
    "The total order (price DESC, then key) makes the page "
    "deterministic. Scale note: OFFSET still sorts/skips the head on "
    "the driver side of the limit — fine for report pages; deep "
    "pagination at 100 TB should switch to keyset predicates "
    "(WHERE (price, key) < last_seen ORDER BY ... LIMIT k), which "
    "pushes into the scan.",
)
def pagination_offset_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_PAGINATION_SQL)


@register(
    "pagination_keyset_orders",
    oracle="""
    WITH ls AS (
      SELECT o_totalprice AS ls_price, o_orderkey AS ls_key
      FROM orders ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 1 OFFSET 39
    )
    SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS total_price
    FROM orders, ls
    WHERE o_totalprice < ls_price
       OR (o_totalprice = ls_price AND o_orderkey > ls_key)
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
    doc="keyset (seek-method) pagination — the 100 TB-safe twin of "
    "pagination_offset_orders: the client passes the last-seen "
    "(o_totalprice, o_orderkey) as literals, so the page predicate "
    "`price < p OR (price = p AND key > k)` is PUSHED INTO THE SCAN "
    "(PushedFilters; plan-asserted in tests/test_plans.py) and the "
    "prefix is never re-read, unlike OFFSET which sorts/skips the "
    "head at every depth. Returns the same page 3 as the OFFSET "
    "query. The one-row boundary fetch is TakeOrderedAndProject "
    "(top-40 heap, no global sort).",
)
def pagination_keyset_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    # boundary = last row of page 2 (row 40 of the total order); in a
    # real API the client sends these two scalars back — fetching them
    # here keeps the query self-contained and deterministic
    head = (
        orders.select("o_totalprice", "o_orderkey")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(40)
        .collect()
    )
    if len(head) < 40:  # fewer than 2 full pages -> page 3 is empty
        return (
            orders.limit(0)
            .select(
                "o_orderkey",
                F.col("o_totalprice").cast("double").alias("total_price"),
            )
        )
    ls_price, ls_key = head[-1]["o_totalprice"], head[-1]["o_orderkey"]
    return (
        orders.where(
            (F.col("o_totalprice") < F.lit(ls_price))
            | (
                (F.col("o_totalprice") == F.lit(ls_price))
                & (F.col("o_orderkey") > F.lit(ls_key))
            )
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
        .select(
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("total_price"),
        )
    )


@register(
    "arrow_grouped_user_stats",
    oracle=f"""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS cents_sum,
           CAST(MIN(event_id) AS BIGINT) AS first_event,
           CAST(MAX(event_id) AS BIGINT) AS last_event
    FROM {EVENTS_FINITE_SQL} GROUP BY user_id
    """,
    doc="grouped applyInArrow (Spark 4's Arrow-native grouped-map — "
    "the LAST unexercised entry in the pandas-API family: scalar "
    "pandas_udf, GROUPED_AGG, grouped applyInPandas, cogrouped "
    "applyInPandas, mapInPandas, mapInArrow, and now grouped "
    "applyInArrow): per-user event stats computed with "
    "pyarrow.compute kernels on each group's Table — no pandas "
    "materialization, exact integer outputs (cents quantized with "
    "the engine-agreed FLOOR(x*100 + 0.5)), so the hash matches with "
    "no float policy at all. Scale note: like every grouped-map, no "
    "map-side partials — each user's rows ship whole to one task; "
    "built-in aggs stay preferred in hot paths, this pins the API "
    "for genuinely non-SQL per-group Arrow compute.",
)
def arrow_grouped_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = clean_measures(load_table(spark, sf_dir, "events"), "value").select(
        "user_id", "event_id", "value"
    )

    def stats(table):
        import pyarrow as pa
        import pyarrow.compute as pc

        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(table.column("value"), 100.0), 0.5)),
            pa.int64(),
        )
        return pa.Table.from_pydict(
            {
                "user_id": [table.column("user_id")[0].as_py()],
                "n_events": [table.num_rows],
                "cents_sum": [pc.sum(cents).as_py()],
                "first_event": [pc.min(table.column("event_id")).as_py()],
                "last_event": [pc.max(table.column("event_id")).as_py()],
            }
        )

    return ev.groupBy("user_id").applyInArrow(
        stats,
        schema=(
            "user_id long, n_events long, cents_sum long, "
            "first_event long, last_event long"
        ),
    )
