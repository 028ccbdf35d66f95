"""Data profiling + constraint suite (operators/profiling.py):
metric semantics pinned against independently computed ground truth
on the fixed test corpus (the oracle equivalence itself is covered by
the full-registry gate)."""

from __future__ import annotations

import pyspark.sql.functions as F

from ethiopia_legal_etl_spark.operators.profiling import (
    expectations_check,
    profile_table_stats,
)


def test_profile_matches_direct_aggregates(spark, sf_dir):
    prof = {r["col_name"]: r for r in profile_table_stats(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    assert set(prof) == {"doc_id", "text", "lang", "source", "n_chars"}
    for r in prof.values():
        assert r["n_rows"] == n
        assert 0 <= r["n_null"] <= n
        assert 0 < r["n_distinct"] <= n
        assert abs(r["completeness"] - (n - r["n_null"]) / n) < 1e-12
    # spot-check doc_id: unique, complete, min/max agree with direct scan
    direct = docs.agg(
        F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
    ).first()
    assert prof["doc_id"]["n_null"] == 0
    assert prof["doc_id"]["n_distinct"] == n
    assert prof["doc_id"]["min_repr"] == str(direct["lo"])
    assert prof["doc_id"]["max_repr"] == str(direct["hi"])
    # text profiles LENGTH bounds, rendered as strings of ints
    assert int(prof["text"]["min_repr"]) <= int(prof["text"]["max_repr"])


def test_expectations_violation_counts_are_exact(spark, sf_dir):
    res = {
        r["constraint_name"]: r for r in expectations_check(spark, sf_dir).collect()
    }
    assert len(res) == 7
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    # pin one range constraint against a direct filter count
    bad_qty = li.where(~F.col("l_quantity").between(1, 50)).count()
    r = res["lineitem.l_quantity in [1, 50]"]
    assert r["n_checked"] == li.count()
    assert r["n_violations"] == bad_qty
    assert r["passed"] is (bad_qty == 0)
    # uniqueness on the synthetic orders table must hold exactly
    u = res["orders.o_orderkey is unique"]
    assert u["n_violations"] == 0 and u["passed"] is True
    # passed bit is always consistent with the count
    for r in res.values():
        assert r["passed"] is (r["n_violations"] == 0)


def test_k_anonymity_matches_python_replica(spark, sf_dir):
    """Independent replica: equivalence classes, k, l and suppression
    accounting recomputed in pure Python from the parquet."""
    from ethiopia_legal_etl_spark.operators.profiling import (
        privacy_k_anonymity,
    )

    rows = spark.read.parquet(f"{sf_dir}/customer.parquet").collect()
    cls: dict = {}
    for r in rows:
        qi = (r["c_nationkey"], r["c_mktsegment"])
        b = r["c_acctbal"]
        sens = (
            None
            if b is None
            else ("neg" if b < 0 else "mid" if b < 5000 else "high")
        )
        n, svals = cls.get(qi, (0, set()))
        if sens is not None:
            svals = svals | {sens}
        cls[qi] = (n + 1, svals)
    n_suppressed = sum(n for n, _ in cls.values() if n < 5)
    total = sum(n for n, _ in cls.values())

    got = privacy_k_anonymity(spark, sf_dir).collect()[0]
    assert got["n_classes"] == len(cls)
    assert got["k_anonymity"] == min(n for n, _ in cls.values())
    assert got["l_diversity"] == min(len(s) for _, s in cls.values())
    assert got["n_suppressed"] == n_suppressed
    assert got["suppressed_frac"] == n_suppressed / total
