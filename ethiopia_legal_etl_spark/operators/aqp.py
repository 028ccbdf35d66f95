"""Approximate query processing (AQP) over deterministic hash samples —
the BlinkDB family (Agarwal et al., EuroSys 2013 "BlinkDB: queries with
bounded errors and bounded response times on very large data"; Olken's
sampling-from-databases line; Hellerstein et al.'s online aggregation).

The 100 TB story AQP answers: a 10% (or 0.1%) sample answers a revenue
aggregate in 1/10th (1/1000th) the scan cost with a KNOWN confidence
interval — the sample is chosen by a deterministic multiplicative hash
of the row key, so it is reproducible across runs, engines, and
incremental loads (the property random() sampling lacks: a re-run
re-selects the SAME rows, so estimates are stable and auditable).

Estimator notes (what makes this exactly cross-engine-checkable):
- Bernoulli-by-hash sampling with known inclusion probability f:
  Horvitz-Thompson sum estimate = sample_sum / f — computed in EXACT
  DECIMAL (f = 1/10 makes /f a *10), no float sum order anywhere.
- HT variance estimator for Bernoulli sampling:
  V = sum_{i in S} x_i^2 * (1-f)/f^2 — again exact decimal (the
  factor (1-0.1)/0.01 = 90 is an integer). The ONLY floating-point
  steps are one sqrt of an exactly-agreed double and the +-1.96*se
  interval arithmetic — so the whole error-bar machinery, not just
  the point estimate, is oracle-hash-checkable. (A stddev_samp-based
  formulation would expose engine variance-algorithm differences;
  the sum-of-squares HT form avoids the issue by construction.)

The exact aggregate rides along as in-result accuracy evidence; a
production deployment at 100 TB drops it — that's the point of AQP.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ethiopia_legal_etl_spark.operators.registry import register
from ethiopia_legal_etl_spark.sources.tables import load_table

_KNUTH = 2654435761  # same multiplicative constant as corpusops
_F_PCT = 100000  # bucket cutoff of 1,000,000 -> f = 0.1


@register(
    "aqp_sampled_revenue",
    oracle=f"""
    WITH base AS (
      SELECT l_returnflag,
             CAST(l_extendedprice AS DECIMAL(12,2))
             * (1 - CAST(l_discount AS DECIMAL(12,2))) AS rev,
             ((l_orderkey * 10 + l_linenumber) % 1000000007)
               * {_KNUTH} % 1000000 AS bucket
      FROM lineitem
    ),
    samp AS (
      SELECT l_returnflag,
             COUNT(*) AS n_sample,
             SUM(CAST(rev AS DECIMAL(18,4))) AS s,
             -- DECIMAL(19,4) on one side forces DuckDB's int128 path:
             -- the (18,4)x(18,4) form hits its int64 fast path and
             -- overflows on squares near 1e18; value is identical
             SUM(CAST(rev AS DECIMAL(19,4))
                 * CAST(rev AS DECIMAL(18,4))) AS ss
      FROM base WHERE bucket < {_F_PCT}
      GROUP BY l_returnflag
    ),
    exact AS (
      SELECT l_returnflag,
             SUM(CAST(rev AS DECIMAL(18,4))) AS exact_s
      FROM base GROUP BY l_returnflag
    )
    SELECT s.l_returnflag,
           CAST(s.n_sample AS BIGINT) AS n_sample,
           CAST(s.s * 10 AS DOUBLE) AS est_sum,
           ROUND(1.96 * SQRT(CAST(ss * 90 AS DOUBLE)), 2) AS ci_half,
           ROUND(CAST(s.s * 10 AS DOUBLE)
                 - 1.96 * SQRT(CAST(ss * 90 AS DOUBLE)), 2) AS ci_lo,
           ROUND(CAST(s.s * 10 AS DOUBLE)
                 + 1.96 * SQRT(CAST(ss * 90 AS DOUBLE)), 2) AS ci_hi,
           CAST(e.exact_s AS DOUBLE) AS exact_sum,
           CAST(e.exact_s AS DOUBLE)
             BETWEEN ROUND(CAST(s.s * 10 AS DOUBLE)
                           - 1.96 * SQRT(CAST(ss * 90 AS DOUBLE)), 2)
                 AND ROUND(CAST(s.s * 10 AS DOUBLE)
                           + 1.96 * SQRT(CAST(ss * 90 AS DOUBLE)), 2)
             AS ci_covers
    FROM samp s JOIN exact e USING (l_returnflag)
    """,
    doc="BlinkDB-family approximate aggregation (Agarwal et al. "
    "EuroSys'13): revenue per returnflag from a DETERMINISTIC 10% "
    "Knuth-hash Bernoulli sample with Horvitz-Thompson estimate and "
    "a 95% CLT confidence interval. Every arithmetic step up to the "
    "single sqrt is EXACT DECIMAL (HT sum = s*10, HT variance = "
    "sum-of-squares * 90 — integers, no stddev algorithm in sight), "
    "so the full error-bar pipeline is oracle-hash-checked, not just "
    "the point estimate. Exact sums ride along as evidence plus a "
    "ci_covers bit. At 100 TB the sample predicate pushes to the "
    "scan's hash of key columns (1/10th the I/O), the exact branch "
    "disappears, and stratified per-group samples (BlinkDB's "
    "columnsets) replace the uniform one for rare groups.",
)
def aqp_sampled_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rev = (
        F.col("l_extendedprice").cast("decimal(12,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(12,2)"))
    ).cast("decimal(18,4)")
    bucket = (
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")) % 1000000007
    ) * F.lit(_KNUTH) % 1000000
    base = li.select(
        "l_returnflag", rev.alias("rev"), bucket.alias("bucket")
    )
    samp = (
        base.where(F.col("bucket") < _F_PCT)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_sample"),
            F.sum("rev").alias("s"),
            F.sum(F.col("rev") * F.col("rev")).alias("ss"),
        )
    )
    exact = base.groupBy("l_returnflag").agg(F.sum("rev").alias("exact_s"))
    est = (F.col("s") * 10).cast("double")
    half = F.lit(1.96) * F.sqrt((F.col("ss") * 90).cast("double"))
    lo, hi = F.round(est - half, 2), F.round(est + half, 2)
    return samp.join(exact, "l_returnflag").select(
        "l_returnflag",
        F.col("n_sample").cast("long").alias("n_sample"),
        est.alias("est_sum"),
        F.round(half, 2).alias("ci_half"),
        lo.alias("ci_lo"),
        hi.alias("ci_hi"),
        F.col("exact_s").cast("double").alias("exact_sum"),
        F.col("exact_s")
        .cast("double")
        .between(lo, hi)
        .alias("ci_covers"),
    )
