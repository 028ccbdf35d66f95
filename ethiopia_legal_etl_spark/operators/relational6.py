"""Wave 6: modern SQL surface — LATERAL correlated subqueries,
Spark 4 VARIANT semi-structured access, higher-order array lambdas,
GROUP BY ALL, and ordered LISTAGG.

These are the newest additions to Spark's SQL surface (VARIANT and
LISTAGG landed in 4.0); covering them proves the engine tracks the
live API, not a snapshot. DuckDB oracles use its equivalent spellings
(json_extract casts, list lambdas, string_agg ORDER BY).
"""

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ethiopia_legal_etl_spark.operators.registry import register
from ethiopia_legal_etl_spark.sources.tables import load_table


@register(
    "lateral_top2_orders",
    oracle="""
    SELECT c_custkey, l.o_orderkey, ROUND(l.o_totalprice, 2) AS price
    FROM customer,
         LATERAL (SELECT o_orderkey, o_totalprice
                  FROM orders
                  WHERE o_custkey = c_custkey
                  ORDER BY o_totalprice DESC, o_orderkey
                  LIMIT 2) l
    WHERE c_custkey < 200
    """,
    doc="LATERAL correlated subquery with per-row ORDER BY ... LIMIT: "
    "top-2 orders per customer. Catalyst de-correlates this into a "
    "ranked window join — same plan family as the explicit "
    "row_number() spelling, so there is no per-customer re-scan; at "
    "100 TB it is one shuffle on custkey, not N correlated probes.",
)
def lateral_top2_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("v_lat_customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_lat_orders")
    return spark.sql(
        """
        SELECT c_custkey, l.o_orderkey, ROUND(l.o_totalprice, 2) AS price
        FROM v_lat_customer,
             LATERAL (SELECT o_orderkey, o_totalprice
                      FROM v_lat_orders
                      WHERE o_custkey = c_custkey
                      ORDER BY o_totalprice DESC, o_orderkey
                      LIMIT 2) l
        WHERE c_custkey < 200
        """
    )


@register(
    "variant_event_props",
    oracle="""
    -- json_valid guard: DuckDB json_extract RAISES on malformed JSON;
    -- Spark's try_parse_json yields a NULL variant (r10 corruption axis)
    WITH e AS (
      SELECT event_id,
             CASE WHEN json_valid(props)
                  THEN CAST(json_extract(props, '$.k') AS INT)
             END AS k_val
      FROM events
    )
    SELECT event_id, k_val, k_val % 10 AS k_bucket
    FROM e WHERE k_val >= 50
    """,
    doc="Spark 4 VARIANT type: parse_json once, variant_get typed "
    "paths — the open-schema column pattern for event/telemetry "
    "tables. Unlike get_json_object (string re-parse per access), "
    "VARIANT parses once into a binary-encoded tree; at 100 TB the "
    "parse cost is paid at ingest and every downstream access is a "
    "cheap path walk. Oracle = DuckDB json_extract casts.",
)
def variant_event_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # try_parse_json, not parse_json: a truncated/partial telemetry
    # payload must become a NULL variant, not a MALFORMED_RECORD error
    # that kills the job at corpus scale (r10 corruption axis)
    v = F.try_parse_json(F.col("props"))
    k = F.try_variant_get(v, "$.k", "int")
    return (
        ev.select("event_id", k.alias("k_val"))
        .where(F.col("k_val") >= 50)
        .select("event_id", "k_val", (F.col("k_val") % 10).alias("k_bucket"))
    )


@register(
    "hof_token_metrics",
    oracle="""
    SELECT doc_id,
           LEN(list_filter(string_split(text, ' '), t -> LENGTH(t) > 3))
             AS n_long_tokens,
           list_reduce(
             list_prepend(0, list_transform(string_split(text, ' '),
                                            t -> LENGTH(t))),
             (acc, x) -> acc + x) AS total_chars,
           LEN(list_filter(string_split(text, ' '),
                           t -> t LIKE '%ing')) > 0 AS has_ing
    FROM documents WHERE LENGTH(text) > 0
    """,
    doc="higher-order array lambdas end-to-end: transform -> filter "
    "-> aggregate -> exists, all JVM-side Catalyst expressions (no "
    "UDF, no explode/re-group shuffle). The explode spelling of "
    "total_chars would shuffle token rows; the lambda spelling is "
    "a map-side expression — the difference at 100 TB.",
)
def hof_token_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").where(F.length("text") > 0)
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(F.filter(toks, lambda t: F.length(t) > 3)).alias("n_long_tokens"),
        F.aggregate(
            F.transform(toks, lambda t: F.length(t)),
            F.lit(0),
            lambda acc, x: acc + x,
        ).alias("total_chars"),
        F.exists(toks, lambda t: t.endswith("ing")).alias("has_ing"),
    )


@register(
    "groupbyall_status_yearly",
    oracle="""
    SELECT o_orderstatus, EXTRACT(year FROM o_orderdate) AS order_year,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY ALL
    """,
    doc="GROUP BY ALL sugar (every non-aggregate select item becomes "
    "a key) — identical plan to the explicit GROUP BY; both engines "
    "support the same spelling.",
)
def groupbyall_status_yearly(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_gba_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, EXTRACT(year FROM o_orderdate) AS order_year,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        FROM v_gba_orders
        GROUP BY ALL
        """
    )


@register(
    "listagg_nation_suppliers",
    oracle="""
    SELECT n_name,
           string_agg(s_name, ',' ORDER BY s_name) AS suppliers,
           COUNT(*) AS n_suppliers
    FROM supplier JOIN nation ON n_nationkey = s_nationkey
    GROUP BY n_name
    """,
    doc="ordered string aggregation: Spark 4 LISTAGG ... WITHIN GROUP "
    "(ORDER BY) == DuckDB string_agg ORDER BY. The ORDER BY inside "
    "the aggregate makes the result deterministic under shuffle "
    "reordering — the only safe way to emit concatenated strings "
    "from a distributed engine.",
)
def listagg_nation_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("v_la_supplier")
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("v_la_nation")
    return spark.sql(
        """
        SELECT n_name,
               listagg(s_name, ',') WITHIN GROUP (ORDER BY s_name) AS suppliers,
               COUNT(*) AS n_suppliers
        FROM v_la_supplier JOIN v_la_nation ON n_nationkey = s_nationkey
        GROUP BY n_name
        """
    )


@register(
    "sketch_hll_daily_users",
    oracle=None,  # sketch binary format is engine-specific -> rows-only
    doc="mergeable-sketch pattern: per-day HLL sketches of user_id "
    "(DataSketches, hll_sketch_agg), then hll_union_agg across days "
    "and a final estimate. THE incremental-analytics shape at 100 TB: "
    "daily partitions aggregate once into kilobyte sketches; any "
    "date-range distinct-count is a sketch merge, never a re-scan of "
    "raw events. Property-tested against the exact distinct count "
    "(tests/test_relational2.py shape: bounded relative error)."
    " Rows-only verdict (r12): NOT convertible — DataSketches HLL "
    "binary images and union are engine-specific. Ground truth: "
    "bounded relative error vs exact distinct counts (property test).",
)
def sketch_hll_daily_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_distinct_users"),
        F.count(F.lit(1)).alias("n_days"),
        F.sum("n_events").alias("n_events"),
    )
