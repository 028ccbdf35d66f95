"""Unigram-LM tokenizer: brute-force segmentation-ENUMERATION ground
truth vs the lattice forward-backward / Viterbi, exact-integer
determinism, and the Spark-level entries."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from ethiopia_legal_etl_spark.operators.unigram import (
    _SCALE,
    _normalize_logp,
    unigram_encode_tokens,
    unigram_train_table,
    unigram_train_vocab,
    word_expected_counts,
    word_viterbi,
)


# ------------------------------------------------------------------
# Independent enumeration model (exponential in word length — corpus
# words are <= 8 chars, so exact)
# ------------------------------------------------------------------


def enum_segmentations(word, vocab, mpl):
    segs = []

    def rec(i, cur):
        if i == len(word):
            segs.append(list(cur))
            return
        for j in range(i + 1, min(len(word), i + mpl) + 1):
            p = word[i:j]
            if p in vocab:
                cur.append(p)
                rec(j, cur)
                cur.pop()

    rec(0, [])
    return segs


def enum_expected_counts(word, logp, mpl):
    segs = enum_segmentations(word, logp, mpl)
    scores = [sum(logp[p] for p in s) for s in segs]
    m = max(scores)
    weights = [math.exp(s - m) for s in scores]
    z = sum(weights)
    out: dict = {}
    for s, w in zip(segs, weights):
        for p in s:
            out[p] = out.get(p, 0.0) + w / z
    return out


def enum_best_score(word, logp, mpl):
    segs = enum_segmentations(word, logp, mpl)
    return max(sum(logp[p] for p in s) for s in segs)


def toy_logp(pieces):
    """Uniform-ish toy model over the given pieces (chars must cover)."""
    n = len(pieces)
    return {p: math.log((i + 1) / (n * (n + 1) / 2 + 1)) for i, p in enumerate(sorted(pieces))}


WORDS = ["abab", "banana", "aaaa", "xyz", "a", "abcabc", "mississippi"[:8]]
PIECES = set("abcnxyzmisp") | {"ab", "ba", "ana", "aa", "na", "ssi", "is"}


@pytest.mark.parametrize("word", WORDS)
def test_expected_counts_match_enumeration(word):
    logp = toy_logp(PIECES)
    got = word_expected_counts(word, logp, 3)
    want = enum_expected_counts(word, logp, 3)
    assert set(got) == set(want)
    for p in want:
        assert got[p] == pytest.approx(want[p], rel=1e-9, abs=1e-12)
    # expected piece-count mass = expected segmentation length, and
    # every word has >= 1 piece
    assert sum(got.values()) >= 1.0 - 1e-9


@pytest.mark.parametrize("word", WORDS)
def test_viterbi_matches_enumeration_argmax(word):
    logp = toy_logp(PIECES)
    seg = word_viterbi(word, logp, 3)
    assert "".join(seg) == word  # lossless by construction
    got_score = sum(logp[p] for p in seg)
    assert got_score == pytest.approx(
        enum_best_score(word, logp, 3), rel=1e-12
    )


def test_viterbi_tie_rule_shortest_last_piece():
    # 'ab' vs 'a'+'b' exact tie: logp(ab) == logp(a)+logp(b)
    logp = {"a": math.log(0.25), "b": math.log(0.25), "ab": math.log(0.0625)}
    assert word_viterbi("ab", logp, 2) == ["a", "b"]


def test_train_is_deterministic_across_runs(spark, sf_dir):
    t1 = unigram_train_table(spark, sf_dir, n_iters=2)
    t2 = unigram_train_table(spark, sf_dir, n_iters=2)
    assert t1 == t2
    assert len(t1) > 0


def test_train_vocab_properties(spark, sf_dir):
    df = unigram_train_vocab(spark, sf_dir)
    rows = df.collect()
    pieces = [r["piece"] for r in rows]
    assert len(pieces) == len(set(pieces))
    assert all(1 <= len(p) <= 5 for p in pieces)
    assert all(r["micro_count"] > 0 for r in rows)
    # ranks are the (count desc, piece asc) order
    ordered = sorted(rows, key=lambda r: (-r["micro_count"], r["piece"]))
    assert [r["rank"] for r in ordered] == list(range(len(rows)))
    # coverage: every corpus character is a piece
    corpus_chars = {
        c
        for (w,) in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("text")
        .collect()
        for c in (w or "").replace(" ", "")
    }
    assert corpus_chars <= set(pieces)


def test_first_estep_matches_independent_python_model(spark, sf_dir):
    """Full-corpus differential for EM iteration 1: word freqs + seed
    + expected counts re-derived in pure Python with the ENUMERATION
    E-step; Spark's fixed-point totals must agree within rounding."""
    import duckdb

    con = duckdb.connect()
    words = dict(
        con.sql(
            f"""
            SELECT w, COUNT(*) FROM (
              SELECT UNNEST(STRING_SPLIT(text, ' ')) AS w
              FROM read_parquet('{sf_dir}/documents.parquet')
            ) WHERE w != '' GROUP BY w
            """
        ).fetchall()
    )
    # seed: substring weights, top-64 multi-char by (weight desc,
    # piece asc) + all chars — mirrors _seed_pieces independently
    sub = Counter()
    for w, f in words.items():
        for i in range(len(w)):
            for L in range(1, min(5, len(w) - i) + 1):
                sub[w[i : i + L]] += f
    chars = {p: c for p, c in sub.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in sub.items() if len(p) > 1),
        key=lambda t: (-t[1], t[0]),
    )[:64]
    seed = dict(chars)
    seed.update(dict(multi))
    logp = _normalize_logp({p: c * _SCALE for p, c in seed.items()})

    want: Counter = Counter()
    for w, f in words.items():
        for p, e in enum_expected_counts(w, logp, 5).items():
            want[p] += int(round(e * f * _SCALE))

    got = dict(
        unigram_train_table(
            spark, sf_dir, vocab_size=10**6, seed_size=64, n_iters=1
        )
    )
    assert set(got) == {p for p, c in want.items() if c > 0}
    for p, c in got.items():
        # enumeration vs lattice differ only in float-op order; after
        # per-(word,piece) rounding the totals may drift by ~1 micro
        # per contributing word
        assert abs(c - want[p]) <= 2 * len(words), p


def test_encode_tokens_df(spark, sf_dir):
    df = unigram_encode_tokens(spark, sf_dir)
    rows = df.collect()
    assert len(rows) > 0
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    table = unigram_train_table(spark, sf_dir)
    logp = _normalize_logp(dict(table))
    for r in rows[:50]:
        text = docs[r["doc_id"]]
        ws = [w for w in text.split(" ") if w]
        assert r["word_tokens"] == len(ws)
        want = sum(len(word_viterbi(w, logp, 5)) for w in ws)
        assert r["unigram_tokens"] == want
        # subwords never fewer than words, never more than chars
        assert len(ws) <= r["unigram_tokens"] <= sum(len(w) for w in ws)
