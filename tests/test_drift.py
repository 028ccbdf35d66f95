"""Drift-operator semantics (operators/drift.py): KS against an
independent Python ECDF replay (bit-exact), PSI bounds and the
zero-cell exclusion rule.
"""

from ethiopia_legal_etl_spark.operators.drift import (
    drift_ks_two_sample,
    drift_psi_decile_bins,
)


def test_ks_matches_python_ecdf_replay(spark, sf_dir):
    got = {
        r["event_type"]: (r["n_a"], r["n_b"], r["ks_num"], r["ks_stat"])
        for r in drift_ks_two_sample(spark, sf_dir).collect()
    }
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id", "event_type", "value")
        .collect()
    )
    groups: dict[str, list] = {}
    for r in ev:
        if r["value"] is None:
            continue
        groups.setdefault(r["event_type"], []).append(
            (r["value"], "a" if r["event_id"] % 2 == 0 else "b")
        )
    for etype, pts in groups.items():
        n_a = sum(1 for _, s in pts if s == "a")
        n_b = len(pts) - n_a
        # ECDF evaluated at distinct value boundaries
        by_val: dict[float, list] = {}
        for v, s in pts:
            by_val.setdefault(v, [0, 0])[0 if s == "a" else 1] += 1
        i_a = i_b = 0
        ks_num = 0
        for v in sorted(by_val):
            da, db = by_val[v]
            i_a += da
            i_b += db
            ks_num = max(ks_num, abs(i_a * n_b - i_b * n_a))
        assert got[etype] == (n_a, n_b, ks_num, ks_num / (n_a * n_b)), etype
        # the even/odd split is NOT i.i.d. (synthetic values derive
        # from event_id), so only sanity-bound the magnitude
        assert 0 < got[etype][3] < 0.5


def test_psi_small_for_random_split_and_bins_populated(spark, sf_dir):
    rows = drift_psi_decile_bins(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # parity split of formula-derived values: bounded, not tiny
        assert 0.0 <= r["psi"] < 1.5, (r["event_type"], r["psi"])
        assert 1 <= r["n_bins"] <= 10


def test_ks_detects_a_genuinely_shifted_distribution(spark, tmp_path):
    """Plant a location shift between sides: KS must be large —
    the operator actually detects drift, not just agrees with SQL."""
    import pyspark.sql.functions as F

    rows = []
    for i in range(400):
        # even ids ~ [0, 100); odd ids ~ [80, 180) — heavy shift
        v = float((i * 37) % 100) + (0.0 if i % 2 == 0 else 80.0)
        rows.append((i, 1, "2024-01-01 00:00:00", "view", v, "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id: long, user_id: long, ts: string, event_type: string, "
        "value: double, props: string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    (r,) = drift_ks_two_sample(spark, str(tmp_path)).collect()
    assert r["ks_stat"] > 0.7


def test_chi2_independence_matches_scipy_free_reference(spark, sf_dir):
    """Cross-check the folded chi-square against an independent
    driver-side computation from the raw contingency table."""
    from ethiopia_legal_etl_spark.operators.drift import (
        stats_chi2_independence,
    )
    from ethiopia_legal_etl_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    got = stats_chi2_independence(spark, sf_dir).collect()[0]
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    cells = {
        (r["event_type"], r["b"]): r["c"]
        for r in ev.groupBy(
            "event_type",
            F.least(F.floor(F.col("value") / 125), F.lit(3)).alias("b"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    rows = sorted({k[0] for k in cells})
    colsv = sorted({k[1] for k in cells})
    n = sum(cells.values())
    chi2 = 0.0
    for rr in rows:
        for cc in colsv:
            o = cells.get((rr, cc), 0)
            if o == 0:
                continue
            r_tot = sum(v for k, v in cells.items() if k[0] == rr)
            c_tot = sum(v for k, v in cells.items() if k[1] == cc)
            e = r_tot * c_tot / n
            chi2 += (o - e) ** 2 / e
    assert abs(got["chi2"] - chi2) < 1e-4
    assert got["dof"] == (len(rows) - 1) * (len(colsv) - 1)
    assert got["n"] == n


def test_finite_or_null_measure_hygiene_contract(spark):
    """Direct pin of functions/measures.py (axis 8 of the corruption
    mirror): NaN and ±Inf map to NULL, finite values and NULLs pass
    through untouched — 'a failed reading is a NULL reading', the
    contract 21 events entries build on."""
    import math

    from ethiopia_legal_etl_spark.functions.measures import clean_measures

    df = spark.createDataFrame(
        [(1, 1.5), (2, float("nan")), (3, float("inf")),
         (4, float("-inf")), (5, None), (6, 0.0)],
        "event_id long, value double",
    )
    got = {r["event_id"]: r["value"] for r in clean_measures(df, "value").collect()}
    assert got[1] == 1.5 and got[6] == 0.0
    assert got[2] is None and got[3] is None and got[4] is None
    assert got[5] is None
    assert not any(v is not None and math.isnan(v) for v in got.values())
