"""Wave 12: product-analytics shapes over the `events` stream table —
funnel conversion, weekly cohort retention, and an event-transition
(first-order Markov) matrix. These are the workhorse queries of a
large-scale behavioral/training-data pipeline and exercise combinations
the registry didn't yet have: conditional two-stage funnels (agg → agg
→ join → conditional agg), self-join cohort fan-out, and lead() over
ingestion order feeding a window-over-aggregate probability.

Reference parity note: the reference computes none of these (no joins,
SURVEY.md §2.A "explicitly absent"); Layer-B surface per BASELINE.json.

Cross-engine precision rules (see sources/tables.py): events.ts is
TIMESTAMP(NANOS) in parquet — Spark floors to µs, DuckDB keeps ns, so
no query emits raw ts. Interval comparisons (e.g. the funnel's 7-day
window) agree across engines only because the generator emits whole-µs
timestamps: a ts with sub-µs residue landing inside (boundary,
boundary+1µs) would pass Spark's floored comparison and fail DuckDB's
ns one. The guarantee is conditional on generator granularity, not
unconditional. Window order uses
`event_id`, which is verified monotone with ts per user (ingestion
order), so both engines sort identically with no ns-tie hazard.

Scale notes (100 TB): every stage shuffles on `user_id` — uniform,
high-NDV, no skew; the per-user aggregates reduce before any join, so
the funnel/cohort joins move |users| rows, not |events|. AQE coalesces
the post-reduction partitions. No driver-side collection anywhere.
"""

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ethiopia_legal_etl_spark.operators.registry import register
from ethiopia_legal_etl_spark.sources.tables import load_table


# --------------------------------------------------------------------
# Funnel: signup → purchase within 7 days, by signup-day cohort.
# --------------------------------------------------------------------
@register(
    "funnel_signup_purchase_7d",
    oracle="""
    WITH s AS (
      SELECT user_id, MIN(ts) AS signup_ts FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ), p AS (
      SELECT user_id, MIN(ts) AS purchase_ts FROM events
      WHERE event_type = 'purchase' GROUP BY user_id
    )
    SELECT CAST(DATE_TRUNC('day', signup_ts) AS DATE) AS signup_date,
           COUNT(*) AS n_signups,
           CAST(SUM(CASE WHEN purchase_ts >= signup_ts
                     AND purchase_ts <= signup_ts + INTERVAL 7 DAY
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
           ROUND(CAST(SUM(CASE WHEN purchase_ts >= signup_ts
                     AND purchase_ts <= signup_ts + INTERVAL 7 DAY
                    THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 4)
             AS conv_rate
    FROM s LEFT JOIN p USING (user_id)
    GROUP BY signup_date
    """,
    doc="two-stage funnel: first signup vs first purchase per user, "
    "7-day conversion window, grouped by signup day. Both stage "
    "aggregates reduce to |users| rows before the join, so the join "
    "input is dimension-sized regardless of event volume; one "
    "user_id shuffle feeds both branches (ReusedExchange).",
)
def funnel_signup_purchase_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    signups = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    converted = (
        F.col("purchase_ts").isNotNull()
        & (F.col("purchase_ts") >= F.col("signup_ts"))
        & (F.col("purchase_ts") <= F.col("signup_ts") + F.expr("INTERVAL 7 DAYS"))
    ).cast("long")
    return (
        signups.join(purchases, "user_id", "left")
        .groupBy(
            F.date_trunc("day", "signup_ts").cast("date").alias("signup_date")
        )
        .agg(
            F.count(F.lit(1)).alias("n_signups"),
            F.sum(converted).alias("n_converted"),
            F.round(
                F.sum(converted).cast("double") / F.count(F.lit(1)), 4
            ).alias("conv_rate"),
        )
    )


# --------------------------------------------------------------------
# Weekly cohort retention matrix: users by first-activity week ×
# weeks-since-cohort offset.
# --------------------------------------------------------------------
@register(
    "retention_cohort_weekly",
    oracle="""
    WITH cohort AS (
      SELECT user_id,
             CAST(DATE_TRUNC('week', MIN(ts)) AS DATE) AS cohort_week
      FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT user_id,
             CAST(DATE_TRUNC('week', ts) AS DATE) AS activity_week
      FROM events
    )
    SELECT cohort_week,
           DATEDIFF('day', cohort_week, activity_week) // 7 AS week_offset,
           COUNT(*) AS active_users
    FROM activity JOIN cohort USING (user_id)
    GROUP BY cohort_week, week_offset
    """,
    doc="cohort retention: first-event week per user joined back to "
    "per-week activity, counting distinct users per (cohort, offset) "
    "cell. The DISTINCT reduces activity to |users|×|weeks| before "
    "the join; both sides shuffle on user_id once. week_offset is an "
    "exact multiple of 7 days by construction (both sides "
    "week-truncated), so the integer division is engine-stable.",
)
def retention_cohort_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cohort = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("activity_week")
    ).distinct()
    return (
        activity.join(cohort, "user_id")
        .groupBy(
            "cohort_week",
            (
                F.datediff("activity_week", "cohort_week") / F.lit(7)
            )
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("active_users"))
    )


# --------------------------------------------------------------------
# Event-transition matrix: (event_type → next event_type) counts and
# per-source transition probabilities.
# --------------------------------------------------------------------
@register(
    "event_transition_matrix",
    oracle="""
    WITH nxt AS (
      SELECT event_type AS from_event,
             LEAD(event_type) OVER (PARTITION BY user_id ORDER BY event_id)
               AS to_event
      FROM events
    ), cnts AS (
      SELECT from_event, to_event, COUNT(*) AS transitions
      FROM nxt WHERE to_event IS NOT NULL
      GROUP BY from_event, to_event
    )
    SELECT from_event, to_event, transitions,
           ROUND(CAST(transitions AS DOUBLE) /
                 SUM(transitions) OVER (PARTITION BY from_event), 4) AS prob
    FROM cnts
    """,
    doc="first-order Markov transition matrix over per-user event "
    "sequences: lead() ordered by event_id (verified monotone with "
    "ts per user — identical ordering on both engines, immune to the "
    "ns/µs truncation), then a window-over-aggregate normalizes "
    "counts to probabilities. One user_id shuffle for the sequence "
    "window; the 25-cell aggregate output makes the second window "
    "free.",
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    seq = Window.partitionBy("user_id").orderBy("event_id")
    nxt = ev.select(
        F.col("event_type").alias("from_event"),
        F.lead("event_type").over(seq).alias("to_event"),
    ).where(F.col("to_event").isNotNull())
    cnts = nxt.groupBy("from_event", "to_event").agg(
        F.count(F.lit(1)).alias("transitions")
    )
    per_src = Window.partitionBy("from_event")
    return cnts.select(
        "from_event",
        "to_event",
        "transitions",
        F.round(
            F.col("transitions").cast("double")
            / F.sum("transitions").over(per_src),
            4,
        ).alias("prob"),
    )


@register(
    "event_pattern_funnels",
    oracle="""
    WITH g AS (
      -- COALESCE: a group whose event_types are ALL NULL must yield
      -- seq = '' like Spark's array_join (which skips null letters),
      -- not STRING_AGG's NULL (r9 full null-mirror sweep); both
      -- engines skip individual null letters identically
      SELECT user_id, CAST(DATE_TRUNC('day', ts) AS DATE) AS day,
             COALESCE(
               STRING_AGG(left(event_type, 1), '' ORDER BY ts, event_id),
               '') AS seq,
             COUNT(*) AS n_events
      FROM events GROUP BY 1, 2
    )
    SELECT user_id, day, n_events, seq,
           CAST(LEN(regexp_extract_all(seq, 's[vc]*p')) AS BIGINT)
             AS n_funnels,
           CAST(COALESCE(list_max(list_transform(
                  regexp_extract_all(seq, 's[vc]*p'),
                  m -> LENGTH(m))), 0) AS BIGINT) AS longest_funnel
    FROM g
    """,
    doc="MATCH_RECOGNIZE-style event-sequence pattern matching (the "
    "CEP / funnel-with-ordering class — SQL:2016 row pattern "
    "recognition, Flink CEP's bread and butter): per (user, day), "
    "events become a letter sequence in strict (ts, event_id) order "
    "(every event_type has a distinct initial; ties impossible at "
    "sub-day granularity — measured min inter-event gap 58 ms ≫ the "
    "µs-vs-ns engine precision gap), then the pattern "
    "signup (view|click)* purchase runs as the regex 's[vc]*p' — "
    "leftmost non-overlapping greedy matching is identical in Java "
    "and DuckDB's RE2 for this pattern class. Spark shape: ONE "
    "(user, day) aggregate; per-group sequences are day-bounded (the "
    "sessionization trick that keeps collect_list safe at 100 TB — "
    "never an unbounded per-user collect), then pure string "
    "expressions. n_funnels = completed funnels; longest_funnel = "
    "max matched span.",
)
def event_pattern_funnels(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    g = ev.select(
        "user_id",
        F.date_trunc("day", "ts").cast("date").alias("day"),
        F.struct(
            F.col("ts"),
            F.col("event_id"),
            F.substring("event_type", 1, 1).alias("l"),
        ).alias("s"),
    )
    seq = g.groupBy("user_id", "day").agg(
        F.array_join(
            F.transform(F.sort_array(F.collect_list("s")), lambda s: s["l"]),
            "",
        ).alias("seq"),
        F.count(F.lit(1)).alias("n_events"),
    )
    matches = F.expr("regexp_extract_all(seq, 's[vc]*p', 0)")
    return seq.select(
        "user_id",
        "day",
        "n_events",
        "seq",
        F.size(matches).cast("long").alias("n_funnels"),
        F.coalesce(
            F.array_max(F.transform(matches, lambda m: F.length(m))),
            F.lit(0),
        )
        .cast("long")
        .alias("longest_funnel"),
    )
