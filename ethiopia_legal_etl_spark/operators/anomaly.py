"""Streaming-shaped anomaly detection: rolling z-score outliers over
per-user event streams, with the flag decision in EXACT INTEGER
arithmetic (no float threshold anywhere).

The standard telemetry operator — "flag an event whose value sits more
than 3σ from the trailing-window mean" — normally leaks float
nondeterminism through the running sums (a window SUM over DOUBLE is
accumulation-order-dependent, so two engines legitimately disagree in
the last bits, and a value sitting exactly near the 3σ edge flips).
This implementation quantizes once (v = FLOOR(value·100), a single
deterministic IEEE multiply+floor) and then clears ALL denominators
from the z² > 9 test:

    z² = (v·n − s)²(n−1) / (n·(n·ss − s²))   >   9
  ⟺ (v·n − s)²·(n−1)  >  9·n·(n·ss − s²)      — pure BIGINT.

So the anomaly set is bit-reproducible across engines, runs, and
partitionings; z² is additionally emitted as one division of the two
exactly-agreed integers. Magnitude audit: with |v| ≤ B and window
n ≤ 10, |s| ≤ 10B, |v·n − s| ≤ 20B, so the largest term
(v·n−s)²·(n−1) ≤ 3600·B² — below 2⁶³ for B ≤ 5·10⁷ (values up to
$500k in cents). The bound is ENFORCED, not assumed (r6 ADVICE):
any |v| > _V_BOUND raises at runtime rather than letting Spark
silently wrap int64 where DuckDB would raise — keeping the
"bit-reproducible" claim honest on arbitrary inputs.

Scale notes: one shuffle (hash on user_id for the per-user ordered
window); trailing ROWS frames stream in Structured Streaming as
`applyInPandasWithState` per-key deques — the batch twin here pins
the semantics. 100 TB: users are the natural partition key; skewed
power-users fall under AQE skew handling, and the frame is O(10) rows
of state per key regardless of history length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ethiopia_legal_etl_spark.operators.registry import register
from ethiopia_legal_etl_spark.sources.tables import load_table

_WIN = 10  # trailing-window length (rows), excludes the current row
_ZSQ = 9  # flag |z| > 3  ⇔  z² > 9
# |v| bound keeping every BIGINT term of the z² test under 2^63
# (3600·B² < 2^63 ⇔ B ≤ 5·10⁷ cents = $500k); enforced via raise_error.
_V_BOUND = 50_000_000


@register(
    "anomaly_rolling_zscore",
    oracle=f"""
    WITH q AS (
      SELECT event_id, user_id,
             CAST(FLOOR(value * 100) AS BIGINT) AS v,
             ts
      FROM events
    ),
    w AS (
      SELECT event_id, user_id, v,
             CAST(COUNT(v) OVER win AS BIGINT) AS n_prev,
             CAST(COALESCE(SUM(v) OVER win, 0) AS BIGINT) AS s,
             CAST(COALESCE(SUM(v * v) OVER win, 0) AS BIGINT) AS ss
      FROM q
      WINDOW win AS (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN {_WIN} PRECEDING AND 1 PRECEDING
      )
    )
    SELECT event_id, user_id, v, n_prev,
           (v * n_prev - s) * (v * n_prev - s) * (n_prev - 1) AS zsq_num,
           {_ZSQ} * n_prev * (n_prev * ss - s * s) AS zsq_thresh9,
           CAST((v * n_prev - s) * (v * n_prev - s) * (n_prev - 1)
                AS DOUBLE)
             / CAST(n_prev * (n_prev * ss - s * s) AS DOUBLE) AS zsq,
           v * n_prev > s AS spike_up
    FROM w
    WHERE n_prev = {_WIN}
      AND n_prev * ss > s * s
      AND (v * n_prev - s) * (v * n_prev - s) * (n_prev - 1)
          > {_ZSQ} * n_prev * (n_prev * ss - s * s)
    """,
    doc="Rolling z-score anomaly detection over per-user event streams "
    "(trailing 10-event frame, flag |z| > 3) with the flag decision in "
    "EXACT INTEGER arithmetic: values quantized once to cents, then "
    "(v·n−s)²(n−1) > 9·n(n·ss−s²) — all BIGINT, so the anomaly set is "
    "bit-reproducible (a float window-sum formulation is accumulation-"
    "order-dependent and engine-divergent at the 3σ edge). z² emitted "
    "as one division of the two agreed integers. One shuffle (user "
    "hash); O(frame) state per key — the applyInPandasWithState "
    "streaming twin shape.",
)
def anomaly_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v_raw = F.floor(F.col("value") * 100).cast("long")
    # Enforce the documented no-overflow bound: fail loudly instead of
    # wrapping int64 (DuckDB raises on BIGINT overflow; Spark wraps —
    # an unguarded overflow would silently diverge cross-engine).
    v = F.when(
        F.abs(v_raw) > _V_BOUND,
        F.raise_error(
            F.concat(
                F.lit(f"anomaly_rolling_zscore: |v| exceeds {_V_BOUND} "
                      "(cents) — BIGINT z² test would overflow; value="),
                F.col("value").cast("string"),
            )
        ).cast("long"),
    ).otherwise(v_raw)
    q = ev.select(
        "event_id",
        "user_id",
        v.alias("v"),
        "ts",
    )
    win = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-_WIN, -1)
    )
    w = q.select(
        "event_id",
        "user_id",
        "v",
        F.count("v").over(win).alias("n_prev"),
        F.coalesce(F.sum("v").over(win), F.lit(0)).alias("s"),
        F.coalesce(F.sum(F.col("v") * F.col("v")).over(win), F.lit(0)).alias(
            "ss"
        ),
    )
    dev = F.col("v") * F.col("n_prev") - F.col("s")
    var_num = F.col("n_prev") * F.col("ss") - F.col("s") * F.col("s")
    zsq_num = dev * dev * (F.col("n_prev") - 1)
    zsq_thresh = F.lit(_ZSQ) * F.col("n_prev") * var_num
    return (
        w.where(
            (F.col("n_prev") == _WIN)
            & (var_num > 0)
            & (zsq_num > zsq_thresh)
        )
        .select(
            "event_id",
            "user_id",
            "v",
            "n_prev",
            zsq_num.alias("zsq_num"),
            zsq_thresh.alias("zsq_thresh9"),
            (
                zsq_num.cast("double")
                / (F.col("n_prev") * var_num).cast("double")
            ).alias("zsq"),
            (dev > 0).alias("spike_up"),
        )
    )


@register(
    "forecast_seasonal_naive_eval",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(time_bucket(INTERVAL 1 DAY, ts) AS DATE) AS day,
             SUM(CAST(value AS DECIMAL(14,2))) AS rev
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, day
    ),
    ev AS (
      SELECT c.event_type,
             ABS(c.rev - p1.rev) AS ae1,
             ABS(c.rev - p7.rev) AS ae7,
             (c.rev - p1.rev) * (c.rev - p1.rev) AS se1
      FROM daily c
      JOIN daily p1 ON p1.event_type = c.event_type
                   AND p1.day = c.day - INTERVAL 1 DAY
      JOIN daily p7 ON p7.event_type = c.event_type
                   AND p7.day = c.day - INTERVAL 7 DAY
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(ae1) AS DOUBLE) / COUNT(*) AS mae,
           SQRT(CAST(SUM(se1) AS DOUBLE) / COUNT(*)) AS rmse,
           CAST(SUM(ae1) AS DOUBLE)
             / NULLIF(CAST(SUM(ae7) AS DOUBLE), 0.0) AS mase
    FROM ev GROUP BY event_type
    """,
    doc="FORECAST-ACCURACY EVALUATION per event_type: the naive-1 "
    "forecast (yesterday's daily revenue predicts today's) scored "
    "with MAE, RMSE, and MASE (Hyndman & Koehler 2006 — absolute "
    "error scaled by the SEASONAL-naive m=7 error, so mase < 1 means "
    "'beats predicting last week's same weekday'). The eval window "
    "is days where BOTH the 1-day and 7-day lags exist, via CALENDAR "
    "self-joins on (event_type, day - 1/7) rather than positional "
    "LAGs — a missing day must shrink the eval set, not silently "
    "shift the forecast horizon. Exactness: daily revenue and every "
    "|e| / e^2 term are exact DECIMALs (order-free sums, no fold "
    "needed); mae/rmse/mase are single IEEE expressions of the "
    "exactly-agreed decimal totals; zero seasonal denominator emits "
    "NULL mase. Completes the time-series family: gapfill (LOCF), "
    "ewma_user_value (smoothing), monthly_revenue_mom (growth), "
    "anomaly_rolling_zscore (outliers) — this is the eval harness "
    "for the forecasts those feed. Scale: one map-side-combined "
    "groupBy to |types| x |days| rows; the self-joins run on the "
    "tiny aggregate.",
)
def forecast_seasonal_naive_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.where(F.col("value").isNotNull())
        .groupBy(
            "event_type", F.to_date(F.date_trunc("day", "ts")).alias("day")
        )
        .agg(F.sum(F.col("value").cast("decimal(14,2)")).alias("rev"))
    )
    c = daily.select(
        "event_type", "day", F.col("rev").alias("rev_c")
    )
    p1 = daily.select(
        "event_type",
        F.date_add("day", 1).alias("day"),
        F.col("rev").alias("rev_p1"),
    )
    p7 = daily.select(
        "event_type",
        F.date_add("day", 7).alias("day"),
        F.col("rev").alias("rev_p7"),
    )
    e1 = F.col("rev_c") - F.col("rev_p1")
    evd = (
        c.join(p1, ["event_type", "day"])
        .join(p7, ["event_type", "day"])
        .select(
            "event_type",
            F.abs(e1).alias("ae1"),
            F.abs(F.col("rev_c") - F.col("rev_p7")).alias("ae7"),
            (e1 * e1).alias("se1"),
        )
    )
    return evd.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        (F.sum("ae1").cast("double") / F.count(F.lit(1))).alias("mae"),
        F.sqrt(F.sum("se1").cast("double") / F.count(F.lit(1))).alias("rmse"),
        (
            F.sum("ae1").cast("double")
            / F.nullif(F.sum("ae7").cast("double"), F.lit(0.0))
        ).alias("mase"),
    )
