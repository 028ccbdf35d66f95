"""Winnowing fingerprints (Schleimer et al. 2003): the paper's coverage
guarantee, a full pure-Python differential, and the shuffle-free plan."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from ethiopia_legal_etl_spark.operators.textstats import winnowing_fingerprints
from ethiopia_legal_etl_spark.plans.explain import formatted_plan

K, W, PACK = 3, 4, 281474976710656


def _py_winnow(text: str):
    """Independent model: k-gram md5-prefix hashes, w-window rightmost
    min, dedup — mirrors the SQL/Spark definition from the spec."""
    toks = text.split(" ")
    if len(toks) < K:
        return None
    grams = [" ".join(toks[i : i + K]) for i in range(len(toks) - K + 1)]
    hs = [
        int(hashlib.md5(g.encode()).hexdigest()[:12], 16) for g in grams
    ]
    m = len(hs)
    wlen = min(W, m)
    sel = set()
    for j in range(m - wlen + 1):
        win = hs[j : j + wlen]
        mn = min(win)
        # rightmost occurrence of the min
        pos = j + max(i for i, v in enumerate(win) if v == mn)
        sel.add((pos + 1, mn))  # 1-indexed like the SQL
    return m, sorted(sel)


def test_winnowing_matches_python_model_whole_corpus(spark, sf_dir):
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    got = {
        r["doc_id"]: r for r in winnowing_fingerprints(spark, sf_dir).collect()
    }
    want = {d: _py_winnow(t) for d, t in docs.items()}
    want = {d: v for d, v in want.items() if v is not None}
    assert set(got) == set(want)
    for d, (m, fps) in want.items():
        r = got[d]
        assert r["n_grams"] == m
        assert r["n_fps"] == len(fps)
        # fp_pos/fp_hash are comma-joined strings since r10 (driver
        # canonicalizer needs scalar cells)
        pos = [int(x) for x in r["fp_pos"].split(",")]
        hsh = [int(x) for x in r["fp_hash"].split(",")]
        assert list(zip(pos, hsh)) == fps


def test_winnowing_coverage_guarantee(spark, tmp_path):
    """The paper's theorem: any shared token run of length >= w+k-1
    (= 6 here) produces at least one SHARED fingerprint hash, however
    different the surrounding text."""
    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens
    rows = [
        (1, f"one two three {shared} four five six"),
        (2, f"red blue {shared} green yellow purple orange"),
        (3, "totally unrelated words with nothing common here"),
    ]
    d = str(tmp_path / "win")
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(f"{d}/documents.parquet")
    fp = {
        r["doc_id"]: set(r["fp_hash"].split(","))
        for r in winnowing_fingerprints(spark, d).collect()
    }
    assert fp[1] & fp[2], "shared 6-token run must share a fingerprint"
    # the shared fingerprints must come from the shared run: doc3 has
    # no overlap with either
    assert not (fp[1] & fp[3]) and not (fp[2] & fp[3])


def test_winnowing_density_near_theory(spark, sf_dir):
    """Expected density is 2/(w+1) = 0.4 on random-ish hash sequences;
    the synthetic corpus repeats tokens so allow a broad band."""
    row = (
        winnowing_fingerprints(spark, sf_dir)
        .agg(F.avg("density").alias("d"))
        .first()
    )
    assert 0.25 <= row["d"] <= 0.75


def test_winnowing_shuffle_free(spark, sf_dir):
    assert "Exchange" not in formatted_plan(
        winnowing_fingerprints(spark, sf_dir)
    )
