"""Wave 14: surface the registry had not yet exercised, each probed
against DuckDB for identical semantics before registration —

- table-seeded PARALLEL recursion: a RECURSIVE CTE carrying 25
  simultaneous per-seed chains with pure integer steps (the existing
  recursive_monthly_spine is a single scalar date spine; this pins
  the multi-row frontier semantics — seed tracking through UNION ALL
  iteration — that a distributed recursive CTE must get right);
- the DataFrame.unpivot API (previously only the SQL stack() spelling
  was covered) composed as a PIVOT -> UNPIVOT round trip whose long
  form is provably equal to a plain GROUP BY — an inverse-composition
  identity the order-insensitive single-query hash cannot express;
- EWMA via an ordered-array left fold: `aggregate()` over
  `sort_array(collect_list(struct(...)))` — the same fold DuckDB
  spells `list_reduce(list_sort(list(...)))`, producing BIT-IDENTICAL
  doubles because both engines execute the identical IEEE op sequence
  (probed: exact equality on every user, no rounding policy needed).
  Sequential recurrences (EWMA/Kalman-style smoothing) are a class no
  window frame expresses; this is the declarative no-UDF form.

Reference parity note: the reference computes none of these
(SURVEY.md §2.A "explicitly absent"); Layer-B engine surface.

Scale notes: the recursive walk's frontier is |seeds| rows per step
(functional graph, out-degree 1) — the UNION-ALL recursion never
expands; pivot runs on the post-aggregate frame (|priorities| x
|statuses|); EWMA's one shuffle is the per-user groupBy and its
state is O(events-per-user) per key — the applyInPandasWithState
streaming twin shape, same as anomaly_rolling_zscore.
"""

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ethiopia_legal_etl_spark.operators.registry import register
from ethiopia_legal_etl_spark.functions.measures import EVENTS_FINITE_SQL, clean_measures
from ethiopia_legal_etl_spark.sources.tables import load_table


@register(
    "recursive_cte_walk",
    oracle="""
    WITH RECURSIVE walk(seed, node, depth) AS (
      SELECT CAST(n_nationkey AS BIGINT), CAST(n_nationkey AS BIGINT),
             CAST(0 AS BIGINT)
      FROM nation
      UNION ALL
      SELECT seed, (node * 7 + 13) % 50, depth + 1
      FROM walk WHERE depth < 7
    )
    SELECT seed, depth, node FROM walk
    """,
    doc="table-seeded PARALLEL recursion (Spark 4 RECURSIVE CTE, "
    "SPARK-24497): an 8-step walk over the functional graph "
    "node -> (7*node + 13) mod 50 carrying all 25 nation-seeded "
    "chains simultaneously — the multi-row-frontier shape "
    "recursive_monthly_spine's scalar date spine does not exercise "
    "(each iteration must keep per-seed state distinct through UNION "
    "ALL). Pure integer arithmetic, so every row is bit-reproducible "
    "cross-engine. The functional graph (out-degree 1) keeps the "
    "frontier at exactly |seeds| rows per step — the recursion never "
    "expands, so the declared plan is safe at any seed cardinality; "
    "8 iterations = 8 bounded stages.",
)
def recursive_cte_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "nation").createOrReplaceTempView(
        "nation_rcte_v"
    )
    return spark.sql(
        """
        WITH RECURSIVE walk(seed, node, depth) AS (
          SELECT CAST(n_nationkey AS BIGINT), CAST(n_nationkey AS BIGINT),
                 CAST(0 AS BIGINT)
          FROM nation_rcte_v
          UNION ALL
          SELECT seed, (node * 7 + 13) % 50, depth + 1
          FROM walk WHERE depth < 7
        )
        SELECT seed, depth, node FROM walk
        """
    )


@register(
    "pivot_unpivot_orders",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           COUNT(*) AS n_orders
    FROM orders
    WHERE o_orderstatus IN ('O', 'F', 'P')
    GROUP BY o_orderpriority, o_orderstatus
    """,
    doc="PIVOT -> UNPIVOT round trip via the DataFrame.unpivot API "
    "(the registry's unpivot_stack_metrics covers only the SQL "
    "stack() spelling): order counts pivoted wide by status "
    "(explicit value list, so the plan needs no extra pass to "
    "discover columns), then unpivoted back to long form — provably "
    "equal to the plain GROUP BY the oracle runs (null cells from "
    "absent combinations are dropped, matching GROUP BY's omission), "
    "an inverse-composition identity a single query's hash can't "
    "state. Pivot runs on the post-aggregate frame: one shuffle to "
    "|priorities| rows, then a |statuses|-wide projection.",
)
def pivot_unpivot_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    wide = (
        orders.where(F.col("o_orderstatus").isin("O", "F", "P"))
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
    )
    long = wide.unpivot(
        ["o_orderpriority"], ["O", "F", "P"], "o_orderstatus", "n_orders"
    )
    return long.where(F.col("n_orders").isNotNull())


@register(
    "ewma_user_value",
    oracle=f"""
    SELECT user_id,
           CAST(len(vals) AS BIGINT) AS n_events,
           list_reduce(list_transform(list_sort(vals),
                                      x -> CAST(x.v AS DOUBLE)),
                       (acc, x) -> x * 0.5 + acc * 0.5) AS ewma
    FROM (
      SELECT user_id,
             LIST({{'ts': ts, 'event_id': event_id, 'v': value}}) AS vals
      FROM {EVENTS_FINITE_SQL} GROUP BY user_id
    )
    """,
    doc="exponentially weighted moving average (alpha = 0.5, "
    "initialized at the first observation) of each user's event "
    "values, computed as an ORDERED LEFT FOLD over "
    "sort_array(collect_list(struct(ts, event_id, v))) — exactly the "
    "fold DuckDB spells list_reduce(list_sort(...)). Both engines "
    "execute the identical IEEE sequence (x*0.5 + acc*0.5 per step, "
    "ts-then-event_id tie-broken ordering), so the doubles are "
    "BIT-IDENTICAL with no rounding policy — EWMA's recursive "
    "definition makes it inexpressible as a window aggregate, and a "
    "naive per-engine implementation would diverge through "
    "accumulation order. One shuffle (user hash); per-key state is "
    "O(events-per-user) — the applyInPandasWithState streaming-twin "
    "shape shared with anomaly_rolling_zscore.",
)
def ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    # failed readings -> NULL at the scan (ADVICE r10): an un-cleaned
    # NaN would otherwise flow arithmetic-poison through the rest of
    # the user's fold. The fold's NULL semantics (a NULL observation
    # NULLs the accumulator from that step on — the ewma is marked
    # unavailable, the r9-mirror-proven behavior) now covers NaN/Inf
    # readings identically on both engines.
    ev = clean_measures(load_table(spark, sf_dir, "events"), "value").select(
        "user_id", "ts", "event_id", F.col("value").cast("double").alias("v")
    )
    arr = F.sort_array(F.collect_list(F.struct("ts", "event_id", "v")))
    per_user = ev.groupBy("user_id").agg(arr.alias("arr"))
    fold = F.aggregate(
        F.slice(F.col("arr"), 2, F.size("arr") - 1),
        F.element_at(F.col("arr"), 1)["v"],
        lambda acc, x: x["v"] * F.lit(0.5) + acc * F.lit(0.5),
    )
    return per_user.select(
        "user_id",
        F.size("arr").cast("long").alias("n_events"),
        fold.alias("ewma"),
    )


@register(
    "funnel_view_click_purchase",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t1
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t2
      GROUP BY e.user_id
    ),
    stages AS (
      SELECT 1 AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM v
      UNION ALL
      SELECT 2, CAST(COUNT(*) AS BIGINT) FROM c
      UNION ALL
      SELECT 3, CAST(COUNT(*) AS BIGINT) FROM p
    )
    SELECT stage, n_users,
           CASE WHEN stage = 1 THEN 1.0
                WHEN LAG(n_users, 1) OVER (ORDER BY stage) > 0
                THEN CAST(n_users AS DOUBLE)
                     / LAG(n_users, 1) OVER (ORDER BY stage)
                ELSE NULL END AS conversion_from_prev
    FROM stages
    """,
    doc="ORDERED-SEQUENCE funnel (view -> later click -> later "
    "purchase): stage k is reached iff the user performed the stage-k "
    "event STRICTLY AFTER their stage-(k-1) entry time — the "
    "time-ordering constraint that distinguishes a funnel from three "
    "independent filters — completing the funnel family: "
    "funnel_signup_purchase_7d is the 2-stage windowed variant, "
    "event_pattern_funnels the regex-CEP variant, this the k-stage "
    "chained-conversion report (a user who purchased before ever viewing "
    "does not convert). Three chained conditional-min aggregates, "
    "each joined on user_id; timestamps never leave the plan (engines "
    "disagree on raw ts rendering, not ordering), only exact stage "
    "counts and their pairwise conversion ratios (one IEEE division "
    "each) are emitted. Plan: all three aggregates shuffle on the "
    "same user_id key, so at 100 TB one repartition(user_id) is "
    "reused across every stage with zero re-shuffles (co-partitioned "
    "joins); the final 3-row frame is driver-trivial. "
    "# bounded: 3-row stage frame for the LAG window.",
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type"
    )
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    stages = (
        v.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(1).alias("stage"), "n_users"
        )
        .unionAll(
            c.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(2).alias("stage"), "n_users"
            )
        )
        .unionAll(
            p.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(3).alias("stage"), "n_users"
            )
        )
    )
    # bounded: 3-row stage frame
    # conversion is 1.0 at stage 1 by definition, NULL when the prior
    # stage is empty (0/0 must NOT read as 100% conversion, and a
    # blanket coalesce would also have masked the divide-by-zero NULL
    # divergence vs the oracle — ADVICE r7)
    w = Window.orderBy("stage")
    prev = F.lag("n_users", 1, None).over(w)
    return stages.select(
        "stage",
        "n_users",
        F.when(F.col("stage") == 1, F.lit(1.0))
        .when(prev > 0, F.col("n_users").cast("double") / prev.cast("double"))
        .otherwise(F.lit(None).cast("double"))
        .alias("conversion_from_prev"),
    )


@register(
    "stats_corr_exact_moments",
    oracle="""
    WITH q AS (
      SELECT l_returnflag,
             CAST(l_quantity AS DECIMAL(38,0)) AS x,
             CAST(FLOOR(l_extendedprice * 100 + 0.5) AS DECIMAL(38,0)) AS y
      FROM lineitem
    ),
    m AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
      FROM q GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n_rows,
           -- zero-variance -> NULL (Spark side guarded identically;
           -- r13 constant-corpus sweep)
           CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) > 0
                 AND CAST(n * syy - sy * sy AS DOUBLE) > 0
                THEN CAST(n * sxy - sx * sy AS DOUBLE)
                     / SQRT(CAST(n * sxx - sx * sx AS DOUBLE)
                            * CAST(n * syy - sy * sy AS DOUBLE))
                ELSE NULL END AS corr_qty_price,
           CASE WHEN n > 1
                THEN CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * (n - 1) AS DOUBLE)
                ELSE NULL END AS covar_samp_cents
    FROM m
    """,
    doc="Pearson correlation + sample covariance from EXACT DECIMAL "
    "moments: quantity and cents-quantized price accumulate as "
    "DECIMAL(38,0) sums (order-independent, engine-exact), then corr "
    "= (n*Sxy - Sx*Sy) / sqrt((n*Sxx - Sx^2)(n*Syy - Sy^2)) is ONE "
    "fixed IEEE expression over exactly-agreed operands — raw-double "
    "identical, where the built-in corr()/covar_samp() accumulate "
    "floats in partition order and legitimately differ in the last "
    "bits across engines (the same exactness discipline as "
    "anomaly_rolling_zscore and the Gini entry; regr_quantity_price "
    "covers the BUILT-IN regr_* family under the round(4-6) policy — "
    "this entry is the exactness alternative). One shuffle, "
    "map-side partial decimal sums.",
)
def stats_corr_exact_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(38,0)")
    y = F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("decimal(38,0)")
    m = li.select("l_returnflag", x.alias("x"), y.alias("y")).groupBy(
        "l_returnflag"
    ).agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(38,0)").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("decimal(38,0)").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("decimal(38,0)").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    num = (n * F.col("sxy") - sx * sy).cast("double")
    vx = (n * F.col("sxx") - sx * sx).cast("double")
    vy = (n * F.col("syy") - sy * sy).cast("double")
    # Zero-variance / single-row guards (r13 constant-corpus sweep):
    # a constant column makes vx (or vy) exactly 0 and a 1-row group
    # makes n*(n-1) = 0 — both divisions THROW under Spark ANSI.
    # Pearson r is undefined there: NULL, mirrored CASE-for-CASE in
    # the oracle (DuckDB's double division would yield Inf/NaN, not
    # an error, so the guard also keeps the engines value-identical).
    return m.select(
        "l_returnflag",
        n.cast("long").alias("n_rows"),
        F.when((vx > 0) & (vy > 0), num / F.sqrt(vx * vy)).alias(
            "corr_qty_price"
        ),
        F.when(
            n > 1, num / (n * (n - F.lit(1))).cast("double")
        ).alias("covar_samp_cents"),
    )


@register(
    "sessionize_gap30_events",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type, value,
             CASE WHEN ts - LAG(ts) OVER w <= INTERVAL 30 MINUTE
                  THEN 0 ELSE 1 END AS new_sess
      FROM {EVENTS_FINITE_SQL}
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, event_type, value,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sess_seq
      FROM flagged
    )
    SELECT user_id, CAST(sess_seq AS BIGINT) AS sess_seq,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_purchases,
           CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS total_value
    FROM sess GROUP BY user_id, sess_seq
    """,
    doc="batch SESSIONIZATION with row-level session IDs: a new "
    "session starts when the gap to the previous event exceeds 30 "
    "minutes (first event of a user starts session 1 — the NULL lag "
    "falls through the CASE to 1 in both engines); session ids are "
    "the running sum of the new-session flags. This ASSIGNS an id to "
    "every row — the thing stream_session_window's aggregate-only "
    "session_window() cannot do — which is what joining other tables "
    "back to sessions requires. Timestamps never leave the plan "
    "(engines agree on ordering and interval comparison, not ts "
    "rendering). One shuffle (user hash) reused by both windows and "
    "the final aggregate — zero extra exchanges at any scale.",
)
def sessionize_gap30_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = clean_measures(load_table(spark, sf_dir, "events"), "value")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_ok = F.col("ts") - F.lag("ts").over(w) <= F.expr("INTERVAL 30 MINUTE")
    flagged = ev.withColumn(
        "new_sess", F.when(gap_ok, 0).otherwise(1)
    )
    sess = flagged.withColumn(
        "sess_seq",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "sess_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "n_purchases"
        ),
        F.sum(F.col("value").cast("decimal(14,2)")).cast("double").alias(
            "total_value"
        ),
    )


@register(
    "incremental_agg_merge",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE)
             AS total_price
    FROM orders GROUP BY o_orderpriority
    """,
    doc="INCREMENTAL VIEW MAINTENANCE via partial-aggregate merge: the "
    "'historical' partition (orders before 1997) is aggregated once, "
    "the 'new arrivals' (1997 onward) separately, and the two partial "
    "states merge by summing — never re-scanning history. The oracle "
    "runs the full recompute; equality IS the maintenance-correctness "
    "claim, and it holds exactly because count and exact-DECIMAL sums "
    "are commutative monoids (a float sum would NOT merge exactly — "
    "accumulation order differs between the incremental and full "
    "paths). The daily-rollup pattern at 100 TB: yesterday's state is "
    "a tiny aggregate table, only the new partition is scanned; "
    "merge cost is |groups|, independent of history size.",
)
def incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cutoff = F.lit("1997-01-01").cast("date")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n_part"),
            F.sum(F.col("o_totalprice").cast("decimal(14,2)")).alias(
                "price_part"
            ),
        )

    hist = partial(orders.where(F.col("o_orderdate") < cutoff))
    delta = partial(orders.where(F.col("o_orderdate") >= cutoff))
    return (
        hist.unionAll(delta)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("n_part").alias("n_orders"),
            F.sum("price_part").cast("double").alias("total_price"),
        )
    )


@register(
    "experiment_cuped_adjust",
    oracle=f"""
    WITH q AS (
      SELECT user_id,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c,
             ts < TIMESTAMP '2024-01-16 00:00:00' AS pre
      FROM {EVENTS_FINITE_SQL} WHERE value IS NOT NULL AND ts IS NOT NULL
    ),
    u AS (
      SELECT user_id, user_id % 2 AS variant,
             CAST(SUM(CASE WHEN pre THEN c ELSE 0 END)
               AS DECIMAL(38,0)) AS x,
             CAST(SUM(CASE WHEN NOT pre THEN c ELSE 0 END)
               AS DECIMAL(38,0)) AS y
      FROM q GROUP BY user_id
    ),
    pooled AS (
      SELECT CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(x * y) AS sxy,
             SUM(y * y) AS syy
      FROM u
    ),
    g AS (
      SELECT variant,
             CAST(COUNT(*) AS BIGINT) AS n_users,
             SUM(x) AS gx, SUM(y) AS gy
      FROM u GROUP BY variant
    )
    SELECT g.variant,
           g.n_users,
           CAST(g.gy AS DOUBLE) / g.n_users / 100 AS mean_y,
           -- var(x) = 0 (no pre-period signal, e.g. a degenerate
           -- clock putting every event post-period) -> CUPED
           -- undefined -> NULL, matching Spark's try_divide
           CASE WHEN p.n * p.sxx - p.sx * p.sx = 0 THEN NULL
                ELSE (CAST(g.gy AS DOUBLE) / g.n_users
                      - (CAST(p.n * p.sxy - p.sx * p.sy AS DOUBLE)
                         / CAST(p.n * p.sxx - p.sx * p.sx AS DOUBLE))
                        * (CAST(g.gx AS DOUBLE) / g.n_users
                           - CAST(p.sx AS DOUBLE) / CAST(p.n AS DOUBLE)))
                     / 100
           END AS mean_y_cuped,
           CASE WHEN p.n * p.sxx - p.sx * p.sx = 0 THEN NULL
                ELSE CAST(p.n * p.sxy - p.sx * p.sy AS DOUBLE)
                     / CAST(p.n * p.sxx - p.sx * p.sx AS DOUBLE)
           END AS theta,
           CASE WHEN (p.n * p.sxx - p.sx * p.sx = 0)
                  OR (p.n * p.syy - p.sy * p.sy = 0) THEN NULL
                ELSE (CAST(p.n * p.sxy - p.sx * p.sy AS DOUBLE)
                      * CAST(p.n * p.sxy - p.sx * p.sy AS DOUBLE))
                     / (CAST(p.n * p.sxx - p.sx * p.sx AS DOUBLE)
                        * CAST(p.n * p.syy - p.sy * p.sy AS DOUBLE))
           END AS rho2
    FROM g CROSS JOIN pooled p
    """,
    doc="CUPED VARIANCE-REDUCED EXPERIMENT READOUT (Deng et al. WSDM "
    "2013 — the industry-standard A/B variance-reduction): per "
    "variant (user_id parity), the post-period mean revenue and its "
    "CUPED adjustment mean(y) - theta*(mean_g(x) - mean(x)), where x "
    "is each user's PRE-period (Jan 1-15) revenue and theta = "
    "cov(x,y)/var(x) pooled over all users. The naive formulation "
    "computes y_adj per user and float-averages it — an "
    "accumulation-order-dependent sum; here the estimator is reduced "
    "ALGEBRAICALLY to group means, so every input is an exact "
    "DECIMAL(38,0) moment of cents (stats_corr_exact_moments "
    "discipline) and the whole readout is fixed IEEE expressions "
    "over exactly-agreed operands — raw-double identical, no "
    "rounding policy. rho2 (= the variance-reduction factor 1-rho2's "
    "complement) rides along from the same moments. Degenerate "
    "covariate: var(x) = 0 — e.g. a degenerate clock that lands "
    "every event in the post-period, so no user has pre-period "
    "revenue — makes theta 0/0; CUPED is undefined without "
    "pre-period signal, so theta/mean_y_cuped/rho2 are NULL on both "
    "engines (try_divide / CASE WHEN) and mean_y still reads out. "
    "Scale: one "
    "groupBy(user) + two tiny aggregates; the pooled 1-row frame "
    "broadcasts.",
)
def experiment_cuped_adjust(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = clean_measures(
        # raw-column null prefilter keeps IsNotNull(value) PUSHED to
        # the scan (the entry drops null measures anyway); the
        # cleaned non-finites become NULL and fall to the same filter
        load_table(spark, sf_dir, "events").where(
            F.col("value").isNotNull()
        ),
        "value",
    )
    q = ev.where(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    ).select(
        "user_id",
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("c"),
        (F.col("ts") < F.lit("2024-01-16 00:00:00").cast("timestamp")).alias(
            "pre"
        ),
    )
    u = q.groupBy("user_id").agg(
        F.sum(F.when(F.col("pre"), F.col("c")).otherwise(0))
        .cast("decimal(38,0)")
        .alias("x"),
        F.sum(F.when(~F.col("pre"), F.col("c")).otherwise(0))
        .cast("decimal(38,0)")
        .alias("y"),
    ).withColumn("variant", F.col("user_id") % 2)
    pooled = u.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(38,0)").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("decimal(38,0)").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("decimal(38,0)").alias("syy"),
    )
    g = u.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("x").cast("decimal(38,0)").alias("gx"),
        F.sum("y").cast("decimal(38,0)").alias("gy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    cov_num = (n * F.col("sxy") - sx * sy).cast("double")
    var_x = (n * F.col("sxx") - sx * sx).cast("double")
    var_y = (n * F.col("syy") - sy * sy).cast("double")
    # try_divide: a degenerate CLOCK (every event in the post-period —
    # e.g. the whole shard timestamped in one microsecond, r14
    # constant_ts sweep) zeroes every user's pre-period covariate, so
    # var(x) = 0 and theta is 0/0 — CUPED is undefined without
    # pre-period signal, so theta / mean_y_cuped / rho2 are NULL
    # (never an ANSI DIVIDE_BY_ZERO job kill); mean_y is unaffected.
    theta = F.try_divide(cov_num, var_x)
    mean_y = F.col("gy").cast("double") / F.col("n_users")
    mean_x_g = F.col("gx").cast("double") / F.col("n_users")
    mean_x_all = sx.cast("double") / n.cast("double")
    return g.crossJoin(F.broadcast(pooled)).select(
        "variant",
        "n_users",
        (mean_y / 100).alias("mean_y"),
        (
            (mean_y - theta * (mean_x_g - mean_x_all)) / 100
        ).alias("mean_y_cuped"),
        theta.alias("theta"),
        F.try_divide(cov_num * cov_num, var_x * var_y).alias("rho2"),
    )


@register(
    "attribution_linear_credit",
    oracle=f"""
    WITH p AS (
      SELECT event_id AS pid, user_id, ts,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) * 1000 AS v_mc
      FROM {EVENTS_FINITE_SQL}
      WHERE event_type = 'purchase' AND value IS NOT NULL
        AND ts IS NOT NULL
    ),
    t AS (
      SELECT p.pid, p.v_mc, c.event_type AS channel,
             c.ts AS c_ts, c.event_id AS c_id
      FROM p
      LEFT JOIN (SELECT * FROM {EVENTS_FINITE_SQL}
                 WHERE event_type IN ('view', 'click')
                   AND ts IS NOT NULL) c
        ON c.user_id = p.user_id
       AND c.ts >= p.ts - INTERVAL 30 MINUTE AND c.ts <= p.ts
    ),
    r AS (
      SELECT pid, v_mc, channel,
             CAST(COUNT(channel) OVER (PARTITION BY pid) AS BIGINT) AS k,
             ROW_NUMBER() OVER (
               PARTITION BY pid ORDER BY c_ts DESC, c_id DESC
             ) AS rk
      FROM t
    ),
    credits AS (
      SELECT COALESCE(channel, 'unattributed') AS channel,
             CASE
               WHEN channel IS NULL THEN v_mc
               ELSE v_mc // k + CASE WHEN rk = 1 THEN v_mc % k ELSE 0 END
             END AS credit_mc
      FROM r
    )
    SELECT channel,
           CAST(COUNT(*) AS BIGINT) AS n_credits,
           CAST(SUM(credit_mc) AS BIGINT) AS credit_mc,
           CAST(SUM(credit_mc) AS DOUBLE) / 100000 AS credit_usd
    FROM credits GROUP BY channel
    """,
    doc="LINEAR MULTI-TOUCH ATTRIBUTION with EXACT INTEGER credit "
    "conservation: each purchase's value is split across the user's "
    "view/click touches in the preceding 30 minutes — v_millicents "
    "DIV k per touch, REMAINDER to the most recent touch (the "
    "Hamilton-apportionment trick from sample_quota_apportion) — so "
    "sum(credit) == sum(purchase value) EXACTLY, the invariant "
    "float-fraction attribution (v/k summed per channel) violates "
    "through both rounding drift and accumulation order. Zero-touch "
    "purchases flow whole into an 'unattributed' bucket instead of "
    "vanishing (a LEFT interval join, the "
    "stream_stream_interval_join shape at 30 min). Everything is "
    "BIGINT until one display division. Scale: one user-keyed "
    "interval join + one per-purchase window (purchases are the "
    "natural partition key); channel aggregate is map-side-combined. "
    "Conservation is property-tested.",
)
def attribution_linear_credit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = clean_measures(
        # raw-column null prefilter keeps IsNotNull(value) PUSHED to
        # the scan (the entry drops null measures anyway); the
        # cleaned non-finites become NULL and fall to the same filter
        load_table(spark, sf_dir, "events").where(
            F.col("value").isNotNull()
        ),
        "value",
    )
    p = ev.where(
        (F.col("event_type") == "purchase")
        & F.col("value").isNotNull()
        & F.col("ts").isNotNull()
    ).select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        (F.floor(F.col("value") * 100 + 0.5).cast("long") * 1000).alias(
            "v_mc"
        ),
    )
    c = ev.where(
        F.col("event_type").isin("view", "click") & F.col("ts").isNotNull()
    ).select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("c_id"),
        F.col("event_type").alias("channel"),
    )
    t = p.join(
        c,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTE"))
        & (F.col("c_ts") <= F.col("p_ts")),
        "left",
    )
    w_pid = Window.partitionBy("pid")
    r = t.select(
        "pid",
        "v_mc",
        "channel",
        F.count("channel").over(w_pid).alias("k"),
        F.row_number()
        .over(w_pid.orderBy(F.col("c_ts").desc(), F.col("c_id").desc()))
        .alias("rk"),
    )
    credit = F.when(F.col("channel").isNull(), F.col("v_mc")).otherwise(
        F.expr("v_mc DIV k")
        + F.when(F.col("rk") == 1, F.col("v_mc") % F.col("k")).otherwise(0)
    )
    credits = r.select(
        F.coalesce("channel", F.lit("unattributed")).alias("channel"),
        credit.alias("credit_mc"),
    )
    return credits.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_credits"),
        F.sum("credit_mc").alias("credit_mc"),
        (F.sum("credit_mc").cast("double") / 100000).alias("credit_usd"),
    )


@register(
    "experiment_proportion_ztest",
    oracle="""
    WITH u AS (
      SELECT user_id, user_id % 2 AS variant,
             CASE WHEN SUM(CASE WHEN event_type = 'purchase'
                                 THEN 1 ELSE 0 END) >= 14
                  THEN 1 ELSE 0 END AS converted
      FROM events GROUP BY user_id
    ),
    g AS (
      SELECT variant,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(converted) AS BIGINT) AS x
      FROM u WHERE variant IS NOT NULL GROUP BY variant
    ),
    wide AS (
      SELECT
        MAX(CASE WHEN variant = 0 THEN n END) AS n0,
        MAX(CASE WHEN variant = 0 THEN x END) AS x0,
        MAX(CASE WHEN variant = 1 THEN n END) AS n1,
        MAX(CASE WHEN variant = 1 THEN x END) AS x1
      FROM g
    )
    SELECT n0, x0, n1, x1,
           CAST(x0 AS DOUBLE) / n0 AS p0,
           CAST(x1 AS DOUBLE) / n1 AS p1,
           (CAST(x1 AS DOUBLE) / n1 - CAST(x0 AS DOUBLE) / n0)
             / NULLIF(
                 SQRT((CAST(x0 + x1 AS DOUBLE) / (n0 + n1))
                      * (1 - CAST(x0 + x1 AS DOUBLE) / (n0 + n1))
                      * (CAST(1 AS DOUBLE) / n0
                         + CAST(1 AS DOUBLE) / n1)), 0.0)
             AS z_stat
    FROM wide
    """,
    doc="TWO-PROPORTION Z-TEST between experiment variants (user_id "
    "parity): converted = user made >= 14 purchases (every user here "
    "purchases at least once, which would saturate p_pool = 1 and "
    "zero the denominator — guarded with NULLIF anyway); z = "
    "(p1 - p0) / sqrt(p_pool (1 - p_pool)(1/n0 + 1/n1)) — the "
    "standard A/B significance readout next to "
    "experiment_cuped_adjust (which reduces the VARIANCE; this "
    "tests the DIFFERENCE). Counts are exact BIGINTs from one "
    "groupBy(user) + a 2-row pivot; the statistic is one fixed IEEE "
    "expression over agreed integers — raw-double identical. "
    "NULL-variant users (null-mirror user_ids) are excluded "
    "explicitly on both engines. Scale: one user shuffle, then "
    "2-row frames.",
)
def experiment_proportion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        (
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            >= 14
        )
        .cast("int")
        .alias("converted")
    ).withColumn("variant", F.col("user_id") % 2)
    g = (
        u.where(F.col("variant").isNotNull())
        .groupBy("variant")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("converted").alias("x"))
    )
    wide = g.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("variant") == 0, F.col("x"))).alias("x0"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("variant") == 1, F.col("x"))).alias("x1"),
    )
    p0 = F.col("x0").cast("double") / F.col("n0")
    p1 = F.col("x1").cast("double") / F.col("n1")
    pp = (F.col("x0") + F.col("x1")).cast("double") / (
        F.col("n0") + F.col("n1")
    )
    z = (p1 - p0) / F.nullif(
        F.sqrt(
            pp
            * (1 - pp)
            * (
                F.lit(1).cast("double") / F.col("n0")
                + F.lit(1).cast("double") / F.col("n1")
            )
        ),
        F.lit(0.0),
    )
    return wide.select(
        "n0", "x0", "n1", "x1", p0.alias("p0"), p1.alias("p1"), z.alias("z_stat")
    )


@register(
    "experiment_welch_effect",
    oracle=f"""
    WITH u AS (
      SELECT user_id, user_id % 2 AS variant,
             CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
               AS DECIMAL(38,0)) AS y
      FROM {EVENTS_FINITE_SQL} WHERE value IS NOT NULL
      GROUP BY user_id
    ),
    g AS (
      SELECT variant,
             CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
             SUM(y) AS sy, SUM(y * y) AS syy
      FROM u WHERE variant IS NOT NULL GROUP BY variant
    ),
    wide AS (
      SELECT
        MAX(CASE WHEN variant = 0 THEN n END) AS n0,
        MAX(CASE WHEN variant = 0 THEN sy END) AS sy0,
        MAX(CASE WHEN variant = 0 THEN syy END) AS syy0,
        MAX(CASE WHEN variant = 1 THEN n END) AS n1,
        MAX(CASE WHEN variant = 1 THEN sy END) AS sy1,
        MAX(CASE WHEN variant = 1 THEN syy END) AS syy1
      FROM g
    )
    SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
           (CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE)
            - CAST(sy0 AS DOUBLE) / CAST(n0 AS DOUBLE)) / 100
             AS mean_diff,
           (CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE)
            - CAST(sy0 AS DOUBLE) / CAST(n0 AS DOUBLE))
           / SQRT(CAST(n0 * syy0 - sy0 * sy0 AS DOUBLE)
                    / CAST(n0 * (n0 - 1) AS DOUBLE) / CAST(n0 AS DOUBLE)
                  + CAST(n1 * syy1 - sy1 * sy1 AS DOUBLE)
                    / CAST(n1 * (n1 - 1) AS DOUBLE) / CAST(n1 AS DOUBLE))
             AS welch_t,
           (CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE)
            - CAST(sy0 AS DOUBLE) / CAST(n0 AS DOUBLE))
           / SQRT((CAST(n0 * syy0 - sy0 * sy0 AS DOUBLE)
                     / CAST(n0 AS DOUBLE)
                   + CAST(n1 * syy1 - sy1 * sy1 AS DOUBLE)
                     / CAST(n1 AS DOUBLE))
                  / CAST(n0 + n1 - 2 AS DOUBLE))
             AS cohens_d,
           (CAST(n0 AS DOUBLE) - CAST(n0 + n1 AS DOUBLE) / 2)
           * (CAST(n0 AS DOUBLE) - CAST(n0 + n1 AS DOUBLE) / 2)
           / (CAST(n0 + n1 AS DOUBLE) / 2)
           + (CAST(n1 AS DOUBLE) - CAST(n0 + n1 AS DOUBLE) / 2)
             * (CAST(n1 AS DOUBLE) - CAST(n0 + n1 AS DOUBLE) / 2)
             / (CAST(n0 + n1 AS DOUBLE) / 2) AS srm_chi2
    FROM wide
    """,
    doc="WELCH T-STATISTIC + COHEN'S D + SAMPLE-RATIO-MISMATCH check "
    "for the continuous experiment metric (per-user total revenue, "
    "variant = user parity) — the readout panel next to "
    "experiment_proportion_ztest (binary metric) and "
    "experiment_cuped_adjust (variance reduction): Welch 1947's "
    "unequal-variance t, Cohen 1988's standardized effect size, and "
    "the 50/50 chi-square SRM guardrail (Fabijan et al. 2019 — a "
    "skewed assignment invalidates the test before any p-value is "
    "read). Every moment is an exact DECIMAL(38,0) sum of cents; "
    "variances use the n*Syy - Sy^2 clearing "
    "(stats_corr_exact_moments discipline); all three statistics are "
    "fixed IEEE expressions over the six agreed totals — raw-double "
    "identical. One user shuffle, then a 2-row pivot.",
)
def experiment_welch_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = clean_measures(
        # raw-column null prefilter keeps IsNotNull(value) PUSHED to
        # the scan (the entry drops null measures anyway); the
        # cleaned non-finites become NULL and fall to the same filter
        load_table(spark, sf_dir, "events").where(
            F.col("value").isNotNull()
        ),
        "value",
    )
    u = (
        ev.where(F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(
            F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long"))
            .cast("decimal(38,0)")
            .alias("y")
        )
        .withColumn("variant", F.col("user_id") % 2)
    )
    g = (
        u.where(F.col("variant").isNotNull())
        .groupBy("variant")
        .agg(
            F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
            F.sum("y").cast("decimal(38,0)").alias("sy"),
            F.sum(F.col("y") * F.col("y")).cast("decimal(38,0)").alias("syy"),
        )
    )
    wide = g.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("variant") == 0, F.col("sy"))).alias("sy0"),
        F.max(F.when(F.col("variant") == 0, F.col("syy"))).alias("syy0"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("variant") == 1, F.col("sy"))).alias("sy1"),
        F.max(F.when(F.col("variant") == 1, F.col("syy"))).alias("syy1"),
    )
    n0d = F.col("n0").cast("double")
    n1d = F.col("n1").cast("double")
    m0 = F.col("sy0").cast("double") / n0d
    m1 = F.col("sy1").cast("double") / n1d
    v0 = (F.col("n0") * F.col("syy0") - F.col("sy0") * F.col("sy0")).cast(
        "double"
    ) / (F.col("n0") * (F.col("n0") - 1)).cast("double")
    v1 = (F.col("n1") * F.col("syy1") - F.col("sy1") * F.col("sy1")).cast(
        "double"
    ) / (F.col("n1") * (F.col("n1") - 1)).cast("double")
    diff = m1 - m0
    welch = diff / F.sqrt(v0 / n0d + v1 / n1d)
    pooled_num = (
        (F.col("n0") * F.col("syy0") - F.col("sy0") * F.col("sy0")).cast(
            "double"
        )
        / n0d
        + (F.col("n1") * F.col("syy1") - F.col("sy1") * F.col("sy1")).cast(
            "double"
        )
        / n1d
    )
    cohens = diff / F.sqrt(
        pooled_num / (F.col("n0") + F.col("n1") - 2).cast("double")
    )
    half = (F.col("n0") + F.col("n1")).cast("double") / 2
    srm = (n0d - half) * (n0d - half) / half + (n1d - half) * (
        n1d - half
    ) / half
    return wide.select(
        F.col("n0").cast("long").alias("n0"),
        F.col("n1").cast("long").alias("n1"),
        (diff / 100).alias("mean_diff"),
        welch.alias("welch_t"),
        cohens.alias("cohens_d"),
        srm.alias("srm_chi2"),
    )
