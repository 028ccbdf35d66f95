"""Wave 3: remaining §2.B surface — ntile/percent_rank/cume_dist
windows, map-typed columns, the A-2 HTML link-extraction operator as
pure SQL (regexp_extract_all + explode), and multi-format source
round-trips (CSV/JSON/text scans).

Note: no `from __future__ import annotations` (pandas_udf hint rule).
"""

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ethiopia_legal_etl_spark.functions.text import absolutize_url
from ethiopia_legal_etl_spark.operators.registry import register
from ethiopia_legal_etl_spark.sources.tables import load_table


@register(
    "window_ntile_percent_rank",
    oracle="""
    SELECT o_orderkey,
           NTILE(4)       OVER (ORDER BY o_totalprice ASC NULLS FIRST, o_orderkey) AS price_quartile,
           ROUND(PERCENT_RANK() OVER (ORDER BY o_totalprice ASC NULLS FIRST, o_orderkey), 6) AS pct_rank,
           ROUND(CUME_DIST()    OVER (ORDER BY o_totalprice ASC NULLS FIRST, o_orderkey), 6) AS cume
    FROM orders
    WHERE o_custkey < 50
    """,
    doc="distribution windows: ntile / percent_rank / cume_dist over a "
    "bounded subset — a global-order window single-partitions its "
    "input, so at 100 TB these run per-partition-key or over "
    "pre-aggregated data (see monthly_revenue_mom), never raw facts.",
)
def window_ntile_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") < 50)
    # explicit null placement: Spark defaults ASC NULLS FIRST, DuckDB
    # NULLS LAST — pin it so both engines rank null prices identically
    # bounded: o_custkey < 50 filter caps the frame (demo of the op;
    # real ntile runs partitioned or over pre-aggregated data, see doc)
    w = Window.orderBy(F.col("o_totalprice").asc_nulls_first(), "o_orderkey")
    return orders.select(
        "o_orderkey",
        F.ntile(4).over(w).alias("price_quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@register(
    "map_ops_user_stats",
    oracle="""
    WITH per_type AS (
      SELECT user_id, event_type, COUNT(*) AS cnt
      FROM events WHERE event_type IS NOT NULL
      GROUP BY user_id, event_type
    )
    SELECT user_id,
           MAX(CASE WHEN event_type = 'error'    THEN cnt END) AS error_cnt,
           MAX(CASE WHEN event_type = 'purchase' THEN cnt END) AS purchase_cnt,
           COUNT(*) AS n_types
    FROM per_type
    GROUP BY user_id
    """,
    doc="map-typed column: per-user event_type→count map built with "
    "map_from_entries, read back with element_at (oracle = the "
    "engine-portable CASE pivot of the same lookup)",
)
def map_ops_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # map keys cannot be null (NULL_MAP_KEY): null event types are
    # excluded on BOTH sides — an unknown type is absent, not a key
    per_type = (
        ev.where(F.col("event_type").isNotNull())
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    as_map = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "cnt"))
        ).alias("type_counts")
    )
    return as_map.select(
        "user_id",
        F.element_at("type_counts", "error").alias("error_cnt"),
        F.element_at("type_counts", "purchase").alias("purchase_cnt"),
        F.size("type_counts").alias("n_types"),
    )


@register(
    "html_link_extraction",
    oracle="""
    WITH pages AS (
      SELECT doc_id,
             CONCAT('<html><body>',
                    '<a href="/files/doc', CAST(doc_id AS VARCHAR), '.pdf">d</a>',
                    '<a href="https://cdn.example.et/x', CAST(doc_id AS VARCHAR), '.pdf">x</a>',
                    '<a href="/about.html">about</a>',
                    '</body></html>') AS html
      FROM documents WHERE doc_id < 100
    ),
    hrefs AS (
      SELECT doc_id, UNNEST(regexp_extract_all(html, 'href="([^"]*)"', 1)) AS href
      FROM pages
    )
    SELECT doc_id,
           CASE WHEN href LIKE 'http%' THEN href
                ELSE CONCAT('https://fsc.example.et', href) END AS url
    FROM hrefs
    WHERE href LIKE '%.pdf'
    """,
    doc="A-2/A-3 as pure SQL: extract hrefs from HTML with "
    "regexp_extract_all + explode, keep *.pdf, absolutize relatives "
    "(scrape_pdf_links.py:12-14 re-expressed without a parser UDF)",
)
def html_link_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    pages = docs.select(
        "doc_id",
        F.concat(
            F.lit('<html><body><a href="/files/doc'),
            F.col("doc_id").cast("string"),
            F.lit('.pdf">d</a><a href="https://cdn.example.et/x'),
            F.col("doc_id").cast("string"),
            F.lit('.pdf">x</a><a href="/about.html">about</a></body></html>'),
        ).alias("html"),
    )
    hrefs = pages.select(
        "doc_id",
        F.explode(F.regexp_extract_all("html", F.lit(r'href="([^"]*)"'), 1)).alias(
            "href"
        ),
    )
    return hrefs.where(F.col("href").endswith(".pdf")).select(
        "doc_id",
        absolutize_url(F.col("href"), "https://fsc.example.et").alias("url"),
    )


@register(
    "unpivot_stack_metrics",
    oracle="""
    SELECT c_custkey, metric, ROUND(value, 2) AS value
    FROM (
      SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS value FROM customer
      UNION ALL
      SELECT c_custkey, 'nationkey', CAST(c_nationkey AS DOUBLE) FROM customer
    )
    WHERE value IS NOT NULL
    """,
    doc="unpivot via stack(): wide columns → (metric, value) long form",
)
def unpivot_stack_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.selectExpr(
        "c_custkey",
        "stack(2, 'acctbal', c_acctbal, 'nationkey', CAST(c_nationkey AS DOUBLE)) "
        "AS (metric, value)",
    ).where(F.col("value").isNotNull()).select(
        "c_custkey", "metric", F.round("value", 2).alias("value")
    )


@register(
    "scd2_merge_emulation",
    oracle="""
    WITH updates AS (
      SELECT c_custkey, c_acctbal + 1000 AS new_bal
      FROM customer WHERE c_custkey % 10 = 0
    ),
    closed AS (  -- current rows being superseded get an end marker
      SELECT c.c_custkey, ROUND(c.c_acctbal, 2) AS acctbal,
             FALSE AS is_current, 1 AS version
      FROM customer c JOIN updates u ON c.c_custkey = u.c_custkey
    ),
    untouched AS (
      SELECT c.c_custkey, ROUND(c.c_acctbal, 2) AS acctbal,
             TRUE AS is_current, 1 AS version
      FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.c_custkey = c.c_custkey)
    ),
    fresh AS (
      SELECT c_custkey, ROUND(new_bal, 2) AS acctbal,
             TRUE AS is_current, 2 AS version
      FROM updates
    )
    SELECT * FROM closed UNION ALL SELECT * FROM untouched UNION ALL SELECT * FROM fresh
    """,
    doc="SCD2 / MERGE INTO emulated without a lakehouse format: "
    "semi/anti-join splits + union build the new version history "
    "(the pyspark_guide 'CDC without Delta' pattern)",
)
def scd2_merge_emulation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    updates = cust.where(F.col("c_custkey") % 10 == 0).select(
        "c_custkey", (F.col("c_acctbal") + 1000).alias("new_bal")
    )
    closed = (
        cust.join(updates, "c_custkey", "left_semi")
        .select(
            "c_custkey",
            F.round("c_acctbal", 2).alias("acctbal"),
            F.lit(False).alias("is_current"),
            F.lit(1).alias("version"),
        )
    )
    untouched = (
        cust.join(updates, "c_custkey", "left_anti")
        .select(
            "c_custkey",
            F.round("c_acctbal", 2).alias("acctbal"),
            F.lit(True).alias("is_current"),
            F.lit(1).alias("version"),
        )
    )
    fresh = updates.select(
        "c_custkey",
        F.round("new_bal", 2).alias("acctbal"),
        F.lit(True).alias("is_current"),
        F.lit(2).alias("version"),
    )
    return closed.unionByName(untouched).unionByName(fresh)


@register(
    "applyinpandas_user_gap_stats",
    oracle="""
    WITH gaps AS (
      SELECT user_id,
             CAST(FLOOR(EPOCH(ts)) AS BIGINT)
               - LAG(CAST(FLOOR(EPOCH(ts)) AS BIGINT))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_s
      FROM events
    )
    SELECT user_id,
           COUNT(gap_s)                        AS n_gaps,
           ROUND(quantile_cont(gap_s, 0.5), 1) AS median_gap_s,
           MAX(gap_s)                          AS max_gap_s
    FROM gaps
    WHERE gap_s IS NOT NULL
    GROUP BY user_id
    """,
    doc="grouped-map applyInPandas: per-user inter-event gap stats "
    "computed in pandas (Arrow batch per group), oracle-checked "
    "against the pure-SQL window formulation. Second-floor epoch "
    "diffs are ns/µs-truncation-safe.",
)
def applyinpandas_user_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")

    def gap_stats(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        # floor to whole epoch seconds, unit-independent (datetime64[s]
        # truncation works for ns- or µs-backed series alike)
        sec = pdf["ts"].astype("datetime64[s]").astype("int64")
        gaps = sec.diff().dropna()
        if len(gaps) == 0:
            return pd.DataFrame(
                columns=["user_id", "n_gaps", "median_gap_s", "max_gap_s"]
            )
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_gaps": [int(len(gaps))],
                "median_gap_s": [round(float(gaps.median()), 1)],
                "max_gap_s": [int(gaps.max())],
            }
        )

    return ev.groupBy("user_id").applyInPandas(
        gap_stats,
        schema="user_id long, n_gaps long, median_gap_s double, max_gap_s long",
    )


@register(
    "asof_merge_asof_pandas",
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
    doc="as-of join, second implementation: per-user applyInPandas with "
    "pd.merge_asof (the pandas path from the guide) — SAME DuckDB ASOF "
    "oracle as the window-based asof_error_prev_purchase, so the two "
    "independent implementations are proven equivalent. Scale: groups "
    "are per-user Arrow batches; the shuffle key is user_id.",
)
def asof_merge_asof_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )

    def per_user(pdf: pd.DataFrame) -> pd.DataFrame:
        err = (
            pdf[pdf["event_type"] == "error"][["event_id", "ts", "user_id"]]
            .sort_values("ts", kind="mergesort")
        )
        pur = (
            pdf[pdf["event_type"] == "purchase"]
            .groupby("ts", as_index=False)["event_id"].max()
            .rename(columns={"event_id": "prev_purchase_id"})
            .sort_values("ts", kind="mergesort")
        )
        if len(err) == 0 or len(pur) == 0:
            return pd.DataFrame(
                columns=["event_id", "user_id", "prev_purchase_id"]
            ).astype({"event_id": "int64", "user_id": "int64", "prev_purchase_id": "int64"})
        merged = pd.merge_asof(err, pur, on="ts", direction="backward")
        out = merged.dropna(subset=["prev_purchase_id"])[
            ["event_id", "user_id", "prev_purchase_id"]
        ]
        return out.astype(
            {"event_id": "int64", "user_id": "int64", "prev_purchase_id": "int64"}
        )

    return ev.groupBy("user_id").applyInPandas(
        per_user, schema="event_id long, user_id long, prev_purchase_id long"
    )


@register(
    "interval_join_error_purchase",
    oracle="""
    SELECT e.event_id AS e_id, p.event_id AS p_id
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e
    JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
      ON e.user_id = p.user_id
     AND p.ts >= e.ts - INTERVAL 1 HOUR
     AND p.ts <= e.ts
    """,
    doc="interval (event-time range) join: purchases within the hour "
    "preceding each error, banded by the user equi-key. Batch twin of "
    "the watermarked stream-stream join in streaming tests; sub-µs "
    "ns-truncation can't flip the hour-scale range predicate.",
)
def interval_join_error_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    e = ev.where("event_type = 'error'").select(
        F.col("event_id").alias("e_id"),
        F.col("user_id").alias("e_user"),
        F.col("ts").alias("e_ts"),
    )
    p = ev.where("event_type = 'purchase'").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    return e.join(
        p,
        (F.col("e_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("e_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("p_ts") <= F.col("e_ts")),
    ).select("e_id", "p_id")


@register(
    "explode_outer_rare_tokens",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             LIST_FILTER(string_split(text, ' '), t -> t = 'query') AS hits
      FROM documents WHERE doc_id < 200
    )
    SELECT doc_id, UNNEST(hits) AS token FROM d WHERE LEN(hits) > 0
    UNION ALL
    -- explode_outer also emits a null row for a NULL array (null
    -- text), not just an empty one (r9 text-null mirror)
    SELECT doc_id, NULL AS token FROM d
    WHERE LEN(hits) = 0 OR hits IS NULL
    """,
    doc="explode_outer + higher-order filter: docs without the token "
    "survive as a null row (LEFT JOIN LATERAL semantics)",
)
def explode_outer_rare_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    hits = F.filter(F.split("text", " "), lambda t: t == "query")
    return docs.select(
        "doc_id", F.explode_outer(hits).alias("token")
    )


@register(
    "scalar_string_extras",
    oracle="""
    SELECT p_partkey,
           LPAD(CAST(p_partkey AS VARCHAR), 8, '0')     AS padded_key,
           REVERSE(p_brand)                             AS brand_rev,
           REPEAT('-', p_size % 5)                      AS size_bar,
           POSITION('o' IN p_name)                      AS first_o,
           LEFT(p_type, 3)                              AS type3,
           RIGHT(p_name, 4)                             AS name_tail,
           CASE WHEN p_size IS NULL THEN 'none'
                WHEN p_size > 25 THEN 'big' ELSE 'small' END AS size_class,
           GREATEST(p_size, 10)                         AS size_floor10,
           LEAST(p_size, 40)                            AS size_cap40,
           NULLIF(p_brand, 'Brand#00')                  AS brand_nullable
    FROM part
    """,
    doc="string/conditional scalar extras: pad, reverse, repeat, "
    "position, left/right, CASE, greatest/least, nullif",
)
def scalar_string_extras(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("padded_key"),
        F.reverse("p_brand").alias("brand_rev"),
        F.repeat(F.lit("-"), F.col("p_size") % 5).alias("size_bar"),
        F.instr("p_name", "o").alias("first_o"),
        F.substring("p_type", 1, 3).alias("type3"),
        F.substring("p_name", -4, 4).alias("name_tail"),
        F.when(F.col("p_size").isNull(), "none")
        .when(F.col("p_size") > 25, "big")
        .otherwise("small")
        .alias("size_class"),
        F.greatest("p_size", F.lit(10)).alias("size_floor10"),
        F.least("p_size", F.lit(40)).alias("size_cap40"),
        F.nullif(F.col("p_brand"), F.lit("Brand#00")).alias("brand_nullable"),
    )


@register(
    "scalar_bitwise_keys",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_orderkey & 255                       AS low_byte,
           l_orderkey | 1                         AS odd_key,
           XOR(l_orderkey, l_linenumber)          AS xored,
           l_linenumber << 4                      AS shifted
    FROM lineitem
    WHERE l_orderkey < 500
    """,
    doc="bitwise scalar family (the SimHash banding primitives, "
    "oracle-checked standalone)",
)
def scalar_bitwise_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 500)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_orderkey").bitwiseAND(F.lit(255)).alias("low_byte"),
        F.col("l_orderkey").bitwiseOR(F.lit(1)).alias("odd_key"),
        F.col("l_orderkey").bitwiseXOR(F.col("l_linenumber").cast("long")).alias("xored"),
        F.shiftleft(F.col("l_linenumber"), 4).alias("shifted"),
    )


@register(
    "stats_aggregates",
    oracle="""
    SELECT l_returnflag,
           ROUND(STDDEV_SAMP(l_quantity), 4) + 0              AS qty_stddev,
           ROUND(VAR_SAMP(l_discount), 6) + 0                 AS disc_var,
           ROUND(CORR(l_quantity, l_extendedprice), 6) + 0    AS qty_price_corr,
           ROUND(COVAR_SAMP(l_discount, l_tax), 6) + 0        AS disc_tax_covar
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="statistical aggregates: stddev/variance/correlation/covariance",
)
def stats_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # `+ 0` canonicalizes IEEE negative zero (-0.0 + 0.0 == +0.0):
    # a rounded covariance of -0.0 must hash identically to 0.0.
    # corr() zero-variance guard (r13 constant-corpus sweep): Spark's
    # Corr final expression is ck/sqrt(xMk*yMk) with NO zero guard, so
    # a constant column makes the built-in THROW under ANSI while
    # DuckDB CORR returns NULL. A CaseWhen over the aggregate does NOT
    # protect it (codegen subexpression elimination evaluates the
    # branch eagerly — verified), so corr is spelled as try_divide
    # over its exact co-moment relatives: covar_pop/(sx_pop*sy_pop) ==
    # ck/sqrt(xMk*yMk) mathematically, NULL on a zero divisor, and
    # round(6) absorbs the last-bit path difference exactly as it
    # already did between the two engines' corr accumulations.
    # stddev/var/covar need no guard: their n==1/n==0 paths return
    # NaN/NULL without dividing.
    #
    # PAIRWISE-complete stddev factors (r14 optimization round's
    # nulls-mirror close gate, inherited from the r13 respell): corr
    # is defined over rows where BOTH columns are non-null, and
    # covar_pop already aggregates exactly those rows — but a bare
    # stddev_pop(x) also counts rows where the OTHER column is NULL,
    # so under the 10%-nulls mirror the respelled ratio drifted ~7e-5
    # from both engines' true corr (clean data can't see it: the
    # builds' sweeps all passed, the interrupted r14 build never
    # re-ran the nulls gate). when(other IS NOT NULL, x) restricts
    # each stddev to the pairwise-complete set; on null-free data the
    # expression is bit-identical to the r13 form. Regression test:
    # tests/test_degenerate_stats.py::test_corr_pairwise_complete_under_nulls.
    q_pair = F.when(F.col("l_extendedprice").isNotNull(), F.col("l_quantity"))
    p_pair = F.when(F.col("l_quantity").isNotNull(), F.col("l_extendedprice"))
    return li.groupBy("l_returnflag").agg(
        (F.round(F.stddev_samp("l_quantity"), 4) + F.lit(0.0)).alias("qty_stddev"),
        (F.round(F.var_samp("l_discount"), 6) + F.lit(0.0)).alias("disc_var"),
        (
            F.round(
                F.try_divide(
                    F.covar_pop("l_quantity", "l_extendedprice"),
                    F.stddev_pop(q_pair) * F.stddev_pop(p_pair),
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("qty_price_corr"),
        (F.round(F.covar_samp("l_discount", "l_tax"), 6) + F.lit(0.0)).alias(
            "disc_tax_covar"
        ),
    )


@register(
    "skew_salted_aggregate",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS cnt
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="two-phase salted aggregation: groupBy (key, salt) partial agg "
    "→ re-agg by key. The explicit skew-mitigation pattern for hot "
    "keys at 100 TB (here l_returnflag has 3 values → every row is a "
    "hot key); result provably identical to the direct groupBy via "
    "the oracle. AQE skew handling covers joins; salting covers aggs "
    "whose key cardinality is below the cluster's parallelism.",
)
def skew_salted_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    salted = li.withColumn("_salt", (F.crc32(F.col("l_orderkey").cast("string")) % 16))
    partial = salted.groupBy("l_returnflag", "_salt").agg(
        F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("qty_part"),
        F.count(F.lit(1)).alias("cnt_part"),
    )
    return partial.groupBy("l_returnflag").agg(
        F.sum("qty_part").cast("double").alias("sum_qty"),
        F.sum("cnt_part").alias("cnt"),
    )


@register(
    "source_roundtrip_formats",
    # rows-only -> ORACLE-CHECKED (r12, VERDICT r11 #3): the scratch
    # files themselves are invisible to DuckDB, but the entry's OUTPUT
    # is per-format row-count reconciliation — and the oracle can
    # recompute the expected count from the source table externally.
    # A format that drops or duplicates rows on write or read now
    # hash-mismatches instead of passing a rows-only "ran" check.
    oracle="""
    WITH n AS (SELECT COUNT(*) AS c FROM documents WHERE doc_id < 100)
    SELECT t.fmt, n.c AS n_rows, n.c AS n_src, TRUE AS roundtrip_ok
    FROM (VALUES ('csv'), ('json'), ('orc'), ('text'), ('xml'))
         AS t(fmt), n
    """,
    doc="CSV + JSONL + ORC + text + XML (Spark 4 native) source/sink "
    "round-trip: documents subset written and re-read in each format "
    "with explicit schemas, counts reconciled (SURVEY §2.B scans/sinks "
    "row). Oracle-checked since r12: the oracle recomputes the "
    "expected count externally, so a row-dropping format sink/source "
    "fails the hash instead of passing a rows-only check",
)
def source_roundtrip_formats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 100)
        .select("doc_id", "lang", "n_chars")
    )
    base = tempfile.mkdtemp(prefix="elel_spark_rt_")
    docs.write.mode("overwrite").option("header", True).csv(f"{base}/csv")
    docs.write.mode("overwrite").json(f"{base}/json")
    docs.write.mode("overwrite").orc(f"{base}/orc")
    docs.select(F.col("doc_id").cast("string")).write.mode("overwrite").text(
        f"{base}/text"
    )
    csv_n = (
        spark.read.schema("doc_id long, lang string, n_chars long")
        .option("header", True)
        .csv(f"{base}/csv")
        .count()
    )
    json_n = (
        spark.read.schema("doc_id long, lang string, n_chars long")
        .json(f"{base}/json")
        .count()
    )
    docs.write.mode("overwrite").option("rowTag", "doc").format("xml").save(
        f"{base}/xml"
    )
    orc_n = spark.read.orc(f"{base}/orc").count()
    text_n = spark.read.text(f"{base}/text").count()
    xml_n = (
        spark.read.schema("doc_id long, lang string, n_chars long")
        .option("rowTag", "doc")
        .format("xml")
        .load(f"{base}/xml")
        .count()
    )
    src_n = docs.count()
    return spark.createDataFrame(
        [
            ("csv", csv_n, src_n),
            ("json", json_n, src_n),
            ("orc", orc_n, src_n),
            ("text", text_n, src_n),
            ("xml", xml_n, src_n),
        ],
        "fmt string, n_rows long, n_src long",
    ).withColumn("roundtrip_ok", F.col("n_rows") == F.col("n_src"))


@register(
    "html_main_text",
    oracle="""
    WITH pages AS (
      SELECT doc_id,
             '<html><head><title>Doc</title><style>.x{color:red}</style>'
             || '</head><body><script>var k="' || doc_id
             || '";</script><nav>Home &amp; About</nav><p>' || text
             || '</p><div>&lt;tag&gt; &quot;quoted&quot;'
             || '&#39;s &nbsp;end</div></body></html>' AS html
      FROM documents
    ),
    stripped AS (
      SELECT doc_id,
             TRIM(regexp_replace(
               replace(replace(replace(replace(replace(replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(html, '<script[^>]*>.*?</script>', ' ', 'gs'),
                     '<style[^>]*>.*?</style>', ' ', 'gs'),
                   '<[^>]+>', ' ', 'g'),
                 '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                 '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&'),
               '[ \t\r\n\f]+', ' ', 'g')) AS main_text
      FROM pages
    )
    SELECT doc_id,
           main_text,
           LENGTH(main_text) AS text_len,
           CASE WHEN main_text = '' THEN 0
                ELSE LENGTH(main_text)
                     - LENGTH(replace(main_text, ' ', '')) + 1 END
             AS n_tokens
    FROM stripped
    """,
    doc="HTML -> main-text extraction, the strip-markup stage every "
    "web-corpus pipeline runs before dedup/quality (C4/CCNet start "
    "from WET text; this produces it from raw HTML): drop script and "
    "style blocks (non-greedy dotall), strip remaining tags, decode "
    "the core character entities (&lt; &gt; &quot; &#39; &nbsp; and "
    "&amp; LAST, so earlier decodes cannot manufacture new entities), "
    "collapse whitespace with an explicit [ \\t\\r\\n\\f] class "
    "(Java \\s and RE2 \\s disagree on \\x0B — the one cross-engine "
    "regex trap here, avoided by never writing \\s). Pure JVM "
    "regexp_replace/replace chain — zero Python, shuffle-free, "
    "whole-stage codegen — and the oracle re-runs the identical chain "
    "in DuckDB, comparing the EXTRACTED TEXT ITSELF, not just "
    "counts. Token count derives from collapsed single spaces "
    "(spaces+1), exact in both engines.",
)
def html_main_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pages = docs.select(
        "doc_id",
        F.concat(
            F.lit(
                '<html><head><title>Doc</title><style>.x{color:red}</style>'
                '</head><body><script>var k="'
            ),
            F.col("doc_id").cast("string"),
            F.lit('";</script><nav>Home &amp; About</nav><p>'),
            F.col("text"),
            F.lit(
                "</p><div>&lt;tag&gt; &quot;quoted&quot;"
                "&#39;s &nbsp;end</div></body></html>"
            ),
        ).alias("html"),
    )
    from ethiopia_legal_etl_spark.functions.text import strip_html

    out = pages.select("doc_id", strip_html(F.col("html")).alias("main_text"))
    return out.select(
        "doc_id",
        "main_text",
        F.length("main_text").cast("long").alias("text_len"),
        F.when(F.col("main_text") == "", F.lit(0))
        .otherwise(
            F.length("main_text")
            - F.length(F.replace(F.col("main_text"), F.lit(" "), F.lit("")))
            + 1
        )
        .cast("long")
        .alias("n_tokens"),
    )


@register(
    "snapshot_diff_reconcile",
    oracle="""
    WITH old_snap AS (
      SELECT event_id, event_type, value
      FROM events WHERE event_id % 7 != 0
    ),
    new_snap AS (
      SELECT event_id, event_type,
             CASE WHEN event_id % 3 = 0 THEN value * 2 ELSE value END
               AS value
      FROM events WHERE event_id % 5 != 0
    ),
    diff AS (
      SELECT COALESCE(o.event_id, n.event_id) AS event_id,
             CASE
               WHEN o.event_id IS NULL THEN 'added'
               WHEN n.event_id IS NULL THEN 'removed'
               WHEN o.event_type IS NOT DISTINCT FROM n.event_type
                AND o.value IS NOT DISTINCT FROM n.value
                 THEN 'unchanged'
               ELSE 'changed'
             END AS status,
             CASE WHEN o.event_id IS NOT NULL AND n.event_id IS NOT NULL
                   AND o.value IS DISTINCT FROM n.value
                  THEN 1 ELSE 0 END AS value_changed,
             CASE WHEN o.event_id IS NOT NULL AND n.event_id IS NOT NULL
                   AND o.event_type IS DISTINCT FROM n.event_type
                  THEN 1 ELSE 0 END AS type_changed
      FROM old_snap o FULL OUTER JOIN new_snap n
        ON o.event_id = n.event_id
    )
    SELECT status,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(value_changed) AS BIGINT) AS n_value_changed,
           CAST(SUM(type_changed) AS BIGINT) AS n_type_changed
    FROM diff GROUP BY status
    """,
    doc="SNAPSHOT DIFF / TABLE RECONCILIATION: classify every key "
    "across two table versions as added / removed / changed / "
    "unchanged with per-column change counts — the audit a lakehouse "
    "pipeline runs after a backfill ('what did this job actually "
    "touch?') and the inverse of scd2_merge_emulation (which APPLIES "
    "changes; this DETECTS them). The two snapshots are derived "
    "deterministically from events (old drops event_id % 7 == 0, new "
    "drops % 5 == 0 and doubles value on % 3 == 0) so adds, removes "
    "and in-place changes all genuinely occur. Column comparison is "
    "NULL-SAFE (IS [NOT] DISTINCT FROM / <=>): a NULL -> value "
    "transition counts as a change, NULL == NULL does not — the "
    "semantics a naive = comparison silently gets wrong on nullable "
    "columns. Scale: ONE full-outer shuffle join on the key (the "
    "minimal possible plan for a diff), then a map-side-combined "
    "4-row aggregate; at 100 TB both sides are bucketed/sorted on "
    "the key and the join is zero-exchange.",
)
def snapshot_diff_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    old_snap = ev.where(F.col("event_id") % 7 != 0).select(
        F.col("event_id").alias("o_id"),
        F.col("event_type").alias("o_type"),
        F.col("value").alias("o_value"),
    )
    new_snap = ev.where(F.col("event_id") % 5 != 0).select(
        F.col("event_id").alias("n_id"),
        F.col("event_type").alias("n_type"),
        F.when(F.col("event_id") % 3 == 0, F.col("value") * 2)
        .otherwise(F.col("value"))
        .alias("n_value"),
    )
    j = old_snap.join(
        new_snap, F.col("o_id") == F.col("n_id"), "full_outer"
    )
    same_type = F.col("o_type").eqNullSafe(F.col("n_type"))
    same_value = F.col("o_value").eqNullSafe(F.col("n_value"))
    both = F.col("o_id").isNotNull() & F.col("n_id").isNotNull()
    status = (
        F.when(F.col("o_id").isNull(), "added")
        .when(F.col("n_id").isNull(), "removed")
        .when(same_type & same_value, "unchanged")
        .otherwise("changed")
    )
    diff = j.select(
        status.alias("status"),
        F.when(both & ~same_value, 1).otherwise(0).alias("value_changed"),
        F.when(both & ~same_type, 1).otherwise(0).alias("type_changed"),
    )
    return diff.groupBy("status").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("value_changed").alias("n_value_changed"),
        F.sum("type_changed").alias("n_type_changed"),
    )
