"""Unit/differential tests for the data-selection operators
(operators/selection.py): DSIR fixed-point importance selection,
incremental snapshot dedup, balanced shard export, and PQ/ADC ANN.

The registry oracles cover the end-to-end numbers; these tests pin
the behaviors the driver testdata cannot reach (its 500 document
texts are all distinct, so the snapshot anti-join never fires there)
and the learned-codebook entry that has no SQL oracle.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

import ethiopia_legal_etl_spark.operators.selection as sel
from ethiopia_legal_etl_spark.operators.selection import (
    _DSIR_SCALE,
    _KNUTH,
    _N_SHARDS,
    _PQ_M,
    _PQ_SUBDIM,
    _codebook_df,
    dedup_incremental_snapshot,
    dsir_importance_select,
    pq_encode,
    shard_export_balance,
    similarity_pq_adc,
    train_pq_codebooks,
)
from ethiopia_legal_etl_spark.sources.tables import load_table


# --------------------------------------------------------------- DSIR


def test_dsir_selects_target_leaning_docs(spark, sf_dir, monkeypatch):
    # target sources use the word 'statute'; raw background uses 'blog'
    rows = [
        (1, "statute statute statute", "en", "src0"),
        (2, "statute statute law", "en", "src1"),
        (3, "blog blog blog", "en", "src5"),
        (4, "blog blog blog blog", "en", "src6"),
        (5, "statute statute statute statute", "en", "src7"),  # target-like
    ]
    docs = spark.createDataFrame(
        rows, "doc_id: long, text: string, lang: string, source: string"
    )
    monkeypatch.setattr(sel, "load_table", lambda *_: docs)
    out = dsir_importance_select(spark, sf_dir).collect()
    assert len(out) == 1
    r = out[0]
    assert r["lang"] == "en" and r["n_docs"] == 5
    # docs 1, 2, 5 are statute-dominated (the target feature), 3/4 are
    # not; 'statute' appears 9/16 times overall, 5 of them in target
    # sources, so its bucket weight is well above the 2x-parity gate
    assert r["n_selected"] == 3


def test_dsir_importance_mass_matches_python_model(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = [
        (r["doc_id"], r["lang"], r["source"], t)
        for r in docs.select("doc_id", "lang", "source", "text").collect()
        for t in r["text"] is not None and str(r["text"]).lower().split(" ") or []
        if t
    ]

    def bucket(t: str) -> int:
        return (ord(t[0]) * 31 + len(t) * 7 + ord(t[-1])) % sel._DSIR_BUCKETS

    cr: dict[int, int] = {}
    ct: dict[int, int] = {}
    for _, _, src, t in toks:
        b = bucket(t)
        cr[b] = cr.get(b, 0) + 1
        if src in sel._DSIR_TARGET_SOURCES:
            ct[b] = ct.get(b, 0) + 1
    w = {b: ct.get(b, 0) * _DSIR_SCALE // cr[b] for b in cr}
    mass: dict[str, int] = {}
    for _, lang, _, t in toks:
        mass[lang] = mass.get(lang, 0) + w[bucket(t)]
    got = {
        r["lang"]: r["importance_mass"]
        for r in dsir_importance_select(spark, sf_dir).collect()
    }
    assert got == mass


def test_dsir_pipeline_dedups_before_learning_weights(
    spark, sf_dir, monkeypatch
):
    from ethiopia_legal_etl_spark.operators.selection import (
        corpus_dsir_pipeline,
    )

    # 'blog' is massively duplicated; with dedup-first the weight table
    # sees it once, so the statute docs (target sources) still win
    rows = [
        (1, "statute statute statute", "en", "src0"),
        (2, "statute law statute", "en", "src1"),
        (5, "statute statute statute statute", "en", "src9"),
        # exact dup of doc 1: would be SELECTED if dedup didn't run
        # first (same statute-heavy text) — keep-first drops it
        (30, "statute statute statute", "en", "src7"),
    ] + [(10 + i, "blog blog blog", "en", f"src{3 + i % 2}") for i in range(20)]
    rows += [(40, "", "en", "src4")]  # empty text -> filtered
    docs = spark.createDataFrame(
        rows, "doc_id: long, text: string, lang: string, source: string"
    )
    monkeypatch.setattr(sel, "load_table", lambda *_: docs)
    out = corpus_dsir_pipeline(spark, sf_dir).collect()
    # survivors of dedup: docs 1, 2, 5 and ONE blog doc (doc_id 10);
    # DSIR keeps the three statute docs, drops the blog representative
    assert sum(r["n_docs"] for r in out) == 3
    kept_shards = {r["shard"] for r in out}
    expected_shards = {(d % 1000000007) * _KNUTH % _N_SHARDS for d in (1, 2, 5)}
    assert kept_shards == expected_shards
    assert sum(r["n_tokens_kept"] for r in out) == 3 + 3 + 4


# ------------------------------------------------ incremental dedup


def test_incremental_dedup_drops_snapshot_and_batch_dups(
    spark, sf_dir, monkeypatch
):
    # doc_id % 3 != 0 -> snapshot; % 3 == 0 -> incoming
    rows = [
        (1, "already crawled"),  # snapshot
        (2, "also crawled"),  # snapshot
        (3, "already crawled"),  # incoming, dup of snapshot -> dropped
        (6, "brand new text"),  # incoming, fresh -> kept
        (9, "brand new text"),  # incoming, dup within batch -> dropped
        (12, "another new one"),  # incoming, fresh -> kept
    ]
    docs = spark.createDataFrame(rows, "doc_id: long, text: string")
    monkeypatch.setattr(sel, "load_table", lambda *_: docs)
    kept = {
        r["doc_id"] for r in dedup_incremental_snapshot(spark, sf_dir).collect()
    }
    assert kept == {6, 12}


def test_incremental_dedup_empty_snapshot_keeps_batch_dedup(
    spark, sf_dir, monkeypatch
):
    rows = [(3, "x"), (6, "x"), (9, "y")]
    docs = spark.createDataFrame(rows, "doc_id: long, text: string")
    monkeypatch.setattr(sel, "load_table", lambda *_: docs)
    kept = {
        r["doc_id"] for r in dedup_incremental_snapshot(spark, sf_dir).collect()
    }
    assert kept == {3, 9}  # lowest doc_id wins within the batch


# ------------------------------------------------------ shard export


def test_shard_assignment_matches_python_hash(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    expected: dict[int, list[int]] = {s: [0, 0] for s in range(_N_SHARDS)}
    for r in docs.collect():
        s = (r["doc_id"] % 1000000007) * _KNUTH % _N_SHARDS
        expected[s][0] += 1
        expected[s][1] += len(str(r["text"]).split(" "))
    out = shard_export_balance(spark, sf_dir).collect()
    assert sum(r["n_docs"] for r in out) == sum(v[0] for v in expected.values())
    for r in out:
        assert [r["n_docs"], r["total_tokens"]] == expected[r["shard"]]
    # balance ratios are shard_tokens / ideal and must average to 1
    # over the shards that exist (all 8 at this corpus size)
    ratios = [r["balance_ratio"] for r in out]
    assert len(ratios) == _N_SHARDS
    assert abs(sum(ratios) / len(ratios) - 1.0) < 1e-4


# ------------------------------------------- matryoshka / fertility


def test_matryoshka_overlap_matches_numpy(spark, sf_dir):
    from ethiopia_legal_etl_spark.operators.selection import (
        _MRL_DIM,
        embedding_matryoshka_overlap,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in emb.collect()
    }

    def top10(q_id, dim):
        q = vecs[q_id][:dim]
        scored = sorted(
            (
                -np.dot(q, v[:dim]) / (np.linalg.norm(q) * np.linalg.norm(v[:dim])),
                vid,
            )
            for vid, v in vecs.items()
            if vid != q_id
        )
        return {vid for _, vid in scored[:10]}

    got = {
        r["q_id"]: r["overlap_top10"]
        for r in embedding_matryoshka_overlap(spark, sf_dir).collect()
    }
    assert set(got) == {0, 1, 2, 3, 4}
    for q_id, n in got.items():
        expected = len(top10(q_id, 64) & top10(q_id, _MRL_DIM))
        assert n == expected, q_id
        assert 0 <= n <= 10


def test_fertility_stats_match_python(spark, sf_dir):
    import re

    from ethiopia_legal_etl_spark.operators.textstats import (
        tokenizer_fertility_stats,
    )

    docs = load_table(spark, sf_dir, "documents")
    pat = re.compile(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+")
    acc: dict[str, list[int]] = {}
    for r in docs.select("lang", "text").collect():
        t = str(r["text"])
        a = acc.setdefault(r["lang"], [0, 0, 0, 0])
        a[0] += 1
        a[1] += len(pat.findall(t))
        a[2] += len(t.split(" "))
        a[3] += len(t.encode("utf-8"))
    for r in tokenizer_fertility_stats(spark, sf_dir).collect():
        n, sub, ws, by = acc[r["lang"]]
        assert (r["n_docs"], r["subword_tokens"], r["ws_tokens"]) == (n, sub, ws)
        assert r["total_bytes"] == by
        assert r["fertility"] == pytest.approx(round(sub / ws, 6))
        assert r["bytes_per_token"] == pytest.approx(round(by / sub, 6))


# -------------------------------------------------------------- PQ


@pytest.fixture(scope="module")
def pq_state(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    books = train_pq_codebooks(spark, emb)
    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in emb.collect()
    }
    return emb, books, vecs


def test_pq_codes_match_numpy_argmin(spark, sf_dir, pq_state):
    emb, books, vecs = pq_state
    codes = pq_encode(emb, _codebook_df(spark, books)).collect()
    got = {(r["vec_id"], r["m"]): r["code"] for r in codes}
    assert len(got) == len(vecs) * _PQ_M
    nb = [np.array(b) for b in books]  # [m] -> (K, subdim)
    for (vid, m), code in got.items():
        sub = vecs[vid][m * _PQ_SUBDIM : (m + 1) * _PQ_SUBDIM]
        d = ((nb[m] - sub) ** 2).sum(axis=1)
        # deterministic tie-break: lowest code among equal distances
        best = int(np.flatnonzero(d == d.min())[0])
        assert code == best, (vid, m)


def test_pq_adc_scores_match_numpy_lut(spark, sf_dir, pq_state):
    emb, books, vecs = pq_state
    adc = sel.pq_adc_scores(spark, emb, books).collect()
    nb = [np.array(b) for b in books]
    codes = {
        (r["vec_id"], r["m"]): r["code"]
        for r in pq_encode(emb, _codebook_df(spark, books)).collect()
    }
    assert len(adc) == 5 * (len(vecs) - 1)  # 5 queries x (N-1) others
    for r in adc:
        q = vecs[r["q_id"]]
        expected = sum(
            (
                (
                    q[m * _PQ_SUBDIM : (m + 1) * _PQ_SUBDIM]
                    - nb[m][codes[(r["vec_id"], m)]]
                )
                ** 2
            ).sum()
            for m in range(_PQ_M)
        )
        assert r["adc_raw"] == pytest.approx(expected, rel=1e-9)


def test_pq_rerank_output_exact_and_recall(spark, sf_dir, pq_state):
    emb, books, vecs = pq_state
    out = similarity_pq_adc(spark, sf_dir).collect()
    # the re-rank stage reports EXACT L2 for whatever it returns
    for r in out:
        d = np.sum((vecs[r["q_id"]] - vecs[r["vec_id"]]) ** 2)
        assert r["l2_dist"] == pytest.approx(round(float(d), 4), abs=1e-9)
    # recall@10 vs exact brute force: bounded by shortlist quality
    # (ADC over 8x16 codewords, 50 of 500 candidates)
    recalls = []
    for q_id in {r["q_id"] for r in out}:
        q = vecs[q_id]
        exact = sorted(
            (np.sum((v - q) ** 2), vid)
            for vid, v in vecs.items()
            if vid != q_id
        )[:10]
        exact_ids = {vid for _, vid in exact}
        got_ids = {r["vec_id"] for r in out if r["q_id"] == q_id}
        recalls.append(len(exact_ids & got_ids) / 10)
    assert sum(recalls) / len(recalls) >= 0.5, recalls


def test_pq_adc_empty_input(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq_

    schema = pa.schema(
        [
            ("vec_id", pa.int64()),
            ("embedding", pa.list_(pa.float32())),
            ("label", pa.int32()),
        ]
    )
    pq_.write_table(schema.empty_table(), tmp_path / "embeddings.parquet")
    out = similarity_pq_adc(spark, str(tmp_path))
    assert out.count() == 0
    assert set(out.columns) == {"q_id", "vec_id", "l2_dist", "rn"}


def test_preference_pairs_properties(spark, sf_dir):
    """DPO-pair invariants: chosen strictly better than rejected by
    the margin, no doc appears on both sides of any pair, pair ranks
    are unique per lang, and pairing really is i-th-best with
    i-th-worst."""
    from pyspark.sql import functions as F

    from ethiopia_legal_etl_spark.operators.selection import (
        preference_pairs_quality,
    )

    rows = preference_pairs_quality(spark, sf_dir).collect()
    assert rows
    per_lang: dict[str, list] = {}
    for r in rows:
        assert r["chosen_q"] - r["rejected_q"] > 0.05
        assert abs(r["margin"] - (r["chosen_q"] - r["rejected_q"])) == 0.0
        assert r["chosen_doc"] != r["rejected_doc"]
        per_lang.setdefault(r["lang"], []).append(r)
    for lang, pairs in per_lang.items():
        ranks = [p["pair_rank"] for p in pairs]
        assert len(set(ranks)) == len(ranks)
        chosen = {p["chosen_doc"] for p in pairs}
        rejected = {p["rejected_doc"] for p in pairs}
        assert not (chosen & rejected), lang
        # the best-ranked pair has the widest margin in its lang
        best = min(pairs, key=lambda p: p["pair_rank"])
        assert best["margin"] == max(p["margin"] for p in pairs)


def test_negative_sampling_deterministic_and_collision_free(spark, sf_dir):
    from ethiopia_legal_etl_spark.operators.selection import (
        contrastive_negative_sample,
    )

    rows = contrastive_negative_sample(spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    seen = {}
    for r in rows:
        # a negative is never the anchor itself
        assert r["neg_id"] != r["anchor_id"]
        assert 0 <= r["neg_id"] < n_docs
        # Knuth-hash replay
        raw = (r["anchor_id"] * 2654435761 + (r["j"] + 1) * 40503) % n_docs
        expect = (raw + 1) % n_docs if raw == r["anchor_id"] else raw
        assert r["neg_id"] == expect
        seen.setdefault(r["anchor_id"], set()).add(r["j"])
    # every anchor got all 4 slots
    assert all(js == {0, 1, 2, 3} for js in seen.values())
    # both hard and easy negatives occur (multilingual corpus)
    flags = {r["hard_negative"] for r in rows}
    assert flags == {True, False}


def test_weighted_aes_matches_python_replica_and_weight_bias(spark, sf_dir):
    """Independent replica of the A-ES selection: ln(u)/w keys
    recomputed with hashlib md5 in pure Python must pick the same
    top-5 per group in the same order. Also checks the scheme is
    actually weight-biased: the sampled mean weight exceeds the group
    mean (heavier items are proportionally more likely)."""
    import hashlib
    import math

    from ethiopia_legal_etl_spark.operators.selection import (
        sample_weighted_aes,
    )

    rows = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    by_grp: dict = {}
    weights: dict = {}
    for r in rows:
        if r["o_totalprice"] is None or not r["o_totalprice"] > 0:
            continue
        u48 = int(
            hashlib.md5(str(r["o_orderkey"]).encode()).hexdigest()[:12], 16
        )
        key = math.log((u48 + 1) / 2.0**48) / r["o_totalprice"]
        by_grp.setdefault(r["o_orderpriority"], []).append(
            (key, r["o_orderkey"])
        )
        weights.setdefault(r["o_orderpriority"], []).append(
            (r["o_orderkey"], r["o_totalprice"])
        )
    want = {}
    for g, items in by_grp.items():
        items.sort(key=lambda t: (-t[0], t[1]))
        for rk, (_, okey) in enumerate(items[:5], start=1):
            want[(g, okey)] = rk

    got = {
        (r["o_orderpriority"], r["o_orderkey"]): r["rk"]
        for r in sample_weighted_aes(spark, sf_dir).collect()
    }
    assert got == want

    # weight bias: mean weight of the sample > mean weight of the group
    # — a k=5 sample is noisy, so require the MAJORITY of groups to
    # show the bias rather than every one
    n_biased = 0
    for g, wl in weights.items():
        grp_mean = sum(w for _, w in wl) / len(wl)
        sampled = [w for okey, w in wl if (g, okey) in got]
        if sum(sampled) / len(sampled) > grp_mean:
            n_biased += 1
    assert n_biased * 2 > len(weights), "A-ES sample is not weight-biased"


def test_quota_apportion_sums_exactly_to_budget(spark, sf_dir):
    """Hamilton apportionment: sum(quota) == K exactly, every quota
    within 1 of the proportional share, and leftover slots go to the
    largest remainders (Hamilton's defining properties)."""
    from ethiopia_legal_etl_spark.operators.selection import (
        sample_quota_apportion,
    )

    rows = sample_quota_apportion(spark, sf_dir).collect()
    assert sum(r["quota"] for r in rows) == 1000
    n = sum(r["n_events"] for r in rows)
    for r in rows:
        exact = 1000 * r["n_events"] / n
        assert r["quota"] in (int(exact), int(exact) + 1)
    # every extra slot went to a remainder >= every non-extra remainder
    extra = [r["rem"] for r in rows if r["got_extra"]]
    none = [r["rem"] for r in rows if not r["got_extra"]]
    if extra and none:
        assert min(extra) >= max(none)
