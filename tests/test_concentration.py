"""Concentration/distribution analytics (operators/concentration.py):
Benford digit shares, Gini, ABC classes, trimmed mean — each pinned
against an independent pure-Python computation."""

from __future__ import annotations

import math

from ethiopia_legal_etl_spark.operators.concentration import (
    abc_classification_parts,
    gini_revenue_concentration,
    robust_trimmed_mean,
    stats_benford_digits,
)


def test_benford_terms_and_shares(spark, sf_dir):
    rows = {r["d"]: r for r in stats_benford_digits(spark, sf_dir).collect()}
    assert set(rows) <= set(range(1, 10))
    n = sum(r["n_d"] for r in rows.values())
    for d, r in rows.items():
        assert r["observed_p"] == r["n_d"] / n
        assert abs(r["benford_p"] - math.log10(1 + 1 / d)) < 1e-9
        e = n * r["benford_p"]
        assert abs(r["chi2_term"] - (r["n_d"] - e) ** 2 / e) < 1e-9
    assert abs(sum(r["observed_p"] for r in rows.values()) - 1.0) < 1e-12


def test_gini_matches_python_and_bounds(spark, sf_dir):
    r = gini_revenue_concentration(spark, sf_dir).first()
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    per_cust = {}
    for row in orders.select("o_custkey", "o_totalprice").collect():
        per_cust[row["o_custkey"]] = (
            per_cust.get(row["o_custkey"], 0.0) + round(row["o_totalprice"], 2)
        )
    xs = sorted(per_cust.values())
    n = len(xs)
    expected = 2 * sum((i + 1) * x for i, x in enumerate(xs)) / (
        n * sum(xs)
    ) - (n + 1) / n
    assert r["n"] == n
    assert abs(r["gini"] - expected) < 1e-6
    assert 0.0 <= r["gini"] < 1.0


def test_abc_classes_partition_all_parts(spark, sf_dir):
    rows = {r["abc_class"]: r for r in abc_classification_parts(spark, sf_dir).collect()}
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    n_parts = li.select("l_partkey").distinct().count()
    assert sum(r["n_parts"] for r in rows.values()) == n_parts
    # A-parts are each at least as big as any B-part, which beat C-parts
    if {"A", "B"} <= set(rows):
        assert rows["A"]["min_part_revenue"] >= rows["B"]["max_part_revenue"]
    if {"B", "C"} <= set(rows):
        assert rows["B"]["min_part_revenue"] >= rows["C"]["max_part_revenue"]
    # boundary definitions: A stops at 70% cumulative share, A+B at 90%
    total = sum(r["class_revenue"] for r in rows.values())
    if "A" in rows:
        assert rows["A"]["class_revenue"] <= 0.70 * total * (1 + 1e-9)
    if {"A", "B"} <= set(rows):
        assert (
            rows["A"]["class_revenue"] + rows["B"]["class_revenue"]
            <= 0.90 * total * (1 + 1e-9)
        )


def test_trimmed_mean_matches_python(spark, sf_dir):
    out = {r["o_orderpriority"]: r for r in robust_trimmed_mean(spark, sf_dir).collect()}
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    groups = {}
    for row in orders.select("o_orderpriority", "o_totalprice", "o_orderkey").collect():
        groups.setdefault(row["o_orderpriority"], []).append(
            (round(row["o_totalprice"], 2), row["o_orderkey"])
        )
    for prio, vals in groups.items():
        vals.sort()
        n = len(vals)
        k = n // 20
        kept = [v for v, _ in vals[k : n - k]]
        r = out[prio]
        assert r["n"] == n and r["n_kept"] == n - 2 * k == len(kept)
        assert abs(r["trimmed_mean"] - sum(kept) / len(kept)) < 1e-6
        assert abs(r["plain_mean"] - sum(v for v, _ in vals) / n) < 1e-6
