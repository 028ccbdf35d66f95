"""DataFrame.observe(): the runtime-metrics instrumentation API — a
named Observation collects aggregates AS THE JOB RUNS (no second scan).
The engine's ingest/ETL counters would ride this at 100 TB instead of
re-aggregating; pinned here against a direct aggregate."""

from pyspark.sql import Observation
from pyspark.sql import functions as F


def test_observe_collects_metrics_without_second_scan(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    obs = Observation("ingest_counters")
    observed = docs.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.length("text")).alias("total_chars"),
        F.sum(F.when(F.length("text") == 0, 1).otherwise(0)).alias("n_empty"),
    )
    # one action drives both the pipeline and the metrics
    n_nonempty = observed.where(F.length("text") > 0).count()
    got = obs.get
    direct = docs.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.length("text")).alias("total_chars"),
        F.sum(F.when(F.length("text") == 0, 1).otherwise(0)).alias("n_empty"),
    ).collect()[0]
    assert got["n_rows"] == direct["n_rows"]
    assert got["total_chars"] == direct["total_chars"]
    assert got["n_empty"] == direct["n_empty"]
    assert n_nonempty == direct["n_rows"] - direct["n_empty"]
