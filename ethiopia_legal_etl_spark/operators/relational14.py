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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ethiopia_legal_etl_spark.operators.registry import register
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
    oracle="""
    SELECT user_id,
           CAST(len(vals) AS BIGINT) AS n_events,
           list_reduce(list_transform(list_sort(vals),
                                      x -> CAST(x.v AS DOUBLE)),
                       (acc, x) -> x * 0.5 + acc * 0.5) AS ewma
    FROM (
      SELECT user_id,
             LIST({'ts': ts, 'event_id': event_id, 'v': value}) AS vals
      FROM events GROUP BY user_id
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
    ev = load_table(spark, sf_dir, "events").select(
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
           CAST(n_users AS DOUBLE)
             / LAG(n_users, 1, n_users) OVER (ORDER BY stage)
             AS conversion_from_prev
    FROM stages
    """,
    doc="ORDERED-SEQUENCE funnel (view -> later click -> later "
    "purchase): stage k is reached iff the user performed the stage-k "
    "event STRICTLY AFTER their stage-(k-1) entry time — the "
    "time-ordering constraint that distinguishes a funnel from three "
    "independent filters (a user who purchased before ever viewing "
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
    w = Window.orderBy("stage")
    return stages.select(
        "stage",
        "n_users",
        (
            F.col("n_users").cast("double")
            / F.lag("n_users", 1, None).over(w).cast("double")
        ).alias("conversion_from_prev"),
    ).withColumn(
        "conversion_from_prev",
        F.coalesce(F.col("conversion_from_prev"), F.lit(1.0)),
    )
