"""AQP sampled aggregates (operators/aqp.py): estimator accuracy,
determinism, and sample-fraction sanity on the fixed test corpus."""

from __future__ import annotations

from ethiopia_legal_etl_spark.operators.aqp import aqp_sampled_revenue


def test_aqp_estimates_cover_exact_and_are_deterministic(spark, sf_dir):
    rows = {r["l_returnflag"]: r for r in aqp_sampled_revenue(spark, sf_dir).collect()}
    assert set(rows) == {"A", "N", "R"}
    for r in rows.values():
        # CI machinery: positive half-width, ordered bounds, coverage
        # (deterministic on this fixed corpus — all three groups cover)
        assert r["ci_half"] > 0
        assert r["ci_lo"] < r["est_sum"] < r["ci_hi"]
        assert r["ci_covers"] is True
        assert abs(r["est_sum"] - r["exact_sum"]) <= r["ci_half"]
        # CLT-scaled bound: rel error within ~4/sqrt(n_sample)
        rel = abs(r["est_sum"] - r["exact_sum"]) / r["exact_sum"]
        assert rel < 4.0 / r["n_sample"] ** 0.5, (rel, r["n_sample"])
    again = {r["l_returnflag"]: r for r in aqp_sampled_revenue(spark, sf_dir).collect()}
    assert {k: tuple(v) for k, v in rows.items()} == {
        k: tuple(v) for k, v in again.items()
    }, "hash sampling must be exactly reproducible"


def test_aqp_sample_fraction_near_nominal(spark, sf_dir):
    import pyspark.sql.functions as F

    total = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    n_samp = (
        aqp_sampled_revenue(spark, sf_dir)
        .agg(F.sum("n_sample").alias("n"))
        .first()["n"]
    )
    f = n_samp / total
    assert 0.08 < f < 0.12, f


def test_stratified_tiers_adapt_to_stratum_size(spark, sf_dir):
    from ethiopia_legal_etl_spark.operators.aqp import aqp_stratified_revenue

    rows = aqp_stratified_revenue(spark, sf_dir).collect()
    assert len(rows) == 6  # (returnflag x linestatus) strata
    for r in rows:
        # tier rule: cutoff must match the stratum size the row carries
        expect = 100000 if r["n_g"] >= 10000 else 500000 if r["n_g"] >= 2000 else 1000000
        assert r["cutoff"] == expect, (r["n_g"], r["cutoff"])
        if r["cutoff"] == 1000000:
            # keep-everything tier: the estimate IS exact, CI is zero
            assert r["n_sample"] == r["n_g"]
            assert r["ci_half"] == 0.0
            assert r["est_sum"] == r["exact_sum"]
        assert r["ci_covers"] is True
        assert abs(r["est_sum"] - r["exact_sum"]) <= r["ci_half"]
