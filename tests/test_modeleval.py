"""Model-eval aggregates (operators/modeleval.py): rank-sum AUC vs an
independent pure-Python AUC (pairwise definition), confusion metrics
vs direct filters, kappa vs the textbook po/pe formula."""

from __future__ import annotations

import pyspark.sql.functions as F

from ethiopia_legal_etl_spark.operators.modeleval import (
    agreement_cohen_kappa,
    model_auc_exact,
    model_confusion_threshold,
)


def _pairwise_auc(pairs: list[tuple[int, int]]) -> float:
    """O(n²) literal AUC: P(score⁺ > score⁻) + ½P(tie) — the definition
    the rank-sum identity must reproduce."""
    pos = [s for s, y in pairs if y == 1]
    neg = [s for s, y in pairs if y == 0]
    wins = sum(1.0 if p > q else 0.5 if p == q else 0.0 for p in pos for q in neg)
    return wins / (len(pos) * len(neg))


def test_auc_matches_pairwise_definition(spark, sf_dir):
    r = model_auc_exact(spark, sf_dir).first()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = [
        (row["n_chars"], 1 if row["lang"] == "en" else 0)
        for row in docs.select("n_chars", "lang").collect()
    ]
    n_pos = sum(y for _, y in pairs)
    assert r["n_pos"] == n_pos
    assert r["n_neg"] == len(pairs) - n_pos
    expected = _pairwise_auc(pairs)
    # rank-sum AUC is exact rational arithmetic; the pairwise sum of
    # 0.5s can accumulate float error, hence the tiny tolerance
    assert abs(r["auc"] - expected) < 1e-9, (r["auc"], expected)
    assert 0.0 <= r["auc"] <= 1.0
    # u_stat_x2 consistency: auc == u2 / (2 * n_pos * n_neg) exactly
    assert r["auc"] == r["u_stat_x2"] / (2 * r["n_pos"] * r["n_neg"])


def test_confusion_counts_and_f1(spark, sf_dir):
    r = model_confusion_threshold(spark, sf_dir).first()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tp = docs.where((F.col("n_chars") >= 300) & (F.col("lang") == "en")).count()
    fp = docs.where((F.col("n_chars") >= 300) & (F.col("lang") != "en")).count()
    fn = docs.where((F.col("n_chars") < 300) & (F.col("lang") == "en")).count()
    assert (r["tp"], r["fp"], r["fn"]) == (tp, fp, fn)
    assert r["tp"] + r["fp"] + r["fn"] + r["tn"] == docs.count()
    assert r["f1"] == 2 * tp / (2 * tp + fp + fn)
    assert r["precision_"] == tp / (tp + fp)
    assert r["recall_"] == tp / (tp + fn)


def test_kappa_matches_textbook_formula(spark, sf_dir):
    r = agreement_cohen_kappa(spark, sf_dir).first()
    n, agree, ap, bp = r["n"], r["n_agree"], r["a_pos"], r["b_pos"]
    po = agree / n
    pe = (ap * bp + (n - ap) * (n - bp)) / (n * n)
    assert abs(r["kappa"] - (po - pe) / (1 - pe)) < 1e-12
    assert -1.0 <= r["kappa"] <= 1.0
    # perfect self-agreement sanity: a labeler against itself -> kappa
    # would be 1; here the two labelers must at least agree above chance
    # on this corpus (the heuristic mostly fires on English word soup)
    assert r["kappa"] > -1.0


def test_ece_calibration_matches_python_replica(spark, sf_dir):
    """Independent replica: ECE/MCE/Brier recomputed in pure Python
    from the parquet — the Spark result must match exactly (the
    operator's arithmetic is integer until one final division)."""
    from ethiopia_legal_etl_spark.operators.modeleval import (
        model_ece_calibration,
    )

    rows = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    bins = {}
    for r in rows:
        if r["n_chars"] is None or r["lang"] is None:
            continue
        cm = min(r["n_chars"], 1000)
        pos = 1 if r["lang"] == "en" else 0
        b = min(cm // 100, 9)
        n, sp, sc, ssq = bins.get(b, (0, 0, 0, 0))
        bins[b] = (n + 1, sp + pos, sc + cm, ssq + (cm - 1000 * pos) ** 2)
    n_tot = sum(v[0] for v in bins.values())
    ece = sum(abs(1000 * sp - sc) for _, sp, sc, _ in bins.values()) / (
        1000 * n_tot
    )
    mce = max(
        abs(1000 * sp - sc) / (1000 * n) for n, sp, sc, _ in bins.values()
    )
    brier = sum(v[3] for v in bins.values()) / (1000000 * n_tot)

    got = model_ece_calibration(spark, sf_dir).collect()[0]
    assert got["n_bins"] == len(bins)
    assert got["n"] == n_tot
    assert got["ece"] == ece
    assert got["mce"] == mce
    assert got["brier"] == brier
    assert 0.0 <= got["ece"] <= got["mce"] <= 1.0
