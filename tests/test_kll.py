"""KLL quantile sketch: measured rank-error gate vs exact ranks,
merge associativity, weight conservation, determinism, and the Spark
partition-sketch path."""

import random

import pytest

from ethiopia_legal_etl_spark.operators.kll import (
    KLLSketch,
    QUANTILES,
    build_partition_sketches,
    merged_sketch_from_rows,
    sketch_kll_order_prices,
)


def rank_error(sorted_vals, x, q) -> float:
    """Distance from target rank q to the exact rank INTERVAL of x
    (repeated values occupy [bisect_left, bisect_right]/n — any q in
    that interval is answered exactly by x)."""
    import bisect

    n = len(sorted_vals)
    lo = bisect.bisect_left(sorted_vals, x) / n
    hi = bisect.bisect_right(sorted_vals, x) / n
    if lo <= q <= hi:
        return 0.0
    return min(abs(q - lo), abs(q - hi))


def max_rank_error(values, sk, quantiles=QUANTILES) -> float:
    sv = sorted(values)
    return max(rank_error(sv, sk.quantile(q), q) for q in quantiles)


_RNG = random.Random(7)
DATASETS = {
    "uniform": [_RNG.random() for _ in range(50_000)],
    "sorted": list(range(30_000)),
    "reversed": list(range(30_000, 0, -1)),
    "zipf-ish": [1.0 / (1 + (i % 1000)) for i in range(40_000)],
    "constant-heavy": [5.0] * 20_000 + [float(i) for i in range(5_000)],
}


@pytest.mark.parametrize("name", sorted(DATASETS))
def test_rank_error_within_bound(name):
    vals = DATASETS[name]
    sk = KLLSketch(k=200)
    for v in vals:
        sk.update(v)
    assert sk.n == len(vals)
    # k=200 over <=50k values: compaction error stays well under 2%
    # ranks on every tested distribution (measured gate; see module
    # docstring for why the randomized KLL bound is replaced by this)
    assert max_rank_error(vals, sk) <= 0.02, name
    # sketch stays bounded: far below the input size
    assert sk.size_items() < 200 * len(sk.levels) <= 200 * 12


def test_weight_conservation():
    sk = KLLSketch(k=64)
    for i in range(10_000):
        sk.update(float(i % 97))
    assert sum(w for _v, w in sk.weighted_items()) == sk.n == 10_000


def test_merge_matches_single_build_accuracy():
    vals = DATASETS["uniform"]
    parts = [vals[i::7] for i in range(7)]
    sketches = []
    for p in parts:
        s = KLLSketch(k=200)
        for v in p:
            s.update(v)
        sketches.append(s)
    merged = KLLSketch(k=200)
    for s in sketches:
        merged.merge(s)
    assert merged.n == len(vals)
    assert sum(w for _v, w in merged.weighted_items()) == len(vals)
    assert max_rank_error(vals, merged) <= 0.02


def test_incremental_day_sketches():
    """The persistable-partials story: sketch(day1) merged with
    sketch(day2) answers the union's quantiles without rescanning."""
    rng = random.Random(13)
    day1 = [rng.gauss(100, 10) for _ in range(20_000)]
    day2 = [rng.gauss(200, 25) for _ in range(20_000)]
    s1, s2 = KLLSketch(k=200), KLLSketch(k=200)
    for v in day1:
        s1.update(v)
    for v in day2:
        s2.update(v)
    s1.merge(s2)
    assert max_rank_error(day1 + day2, s1) <= 0.02


def test_deterministic_for_fixed_order():
    def build():
        sk = KLLSketch(k=64)
        for i in range(25_000):
            sk.update(float((i * 2654435761) % 100_000))
        return sk

    a, b = build(), build()
    assert a.levels == b.levels and a.n == b.n


def test_empty_and_bad_inputs():
    sk = KLLSketch(k=64)
    with pytest.raises(ValueError):
        sk.quantile(0.5)
    for v in (1.0, 2.0):
        sk.update(v)
    with pytest.raises(ValueError):
        sk.quantile(1.5)
    with pytest.raises(ValueError):
        KLLSketch(k=2)
    with pytest.raises(ValueError):
        KLLSketch(k=64).merge(KLLSketch(k=128))


def test_spark_partition_sketches_match_exact(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    rows = build_partition_sketches(orders, "o_totalprice", 200).collect()
    sk = merged_sketch_from_rows(rows, 200)
    vals = [r["o_totalprice"] for r in orders.select("o_totalprice").collect()]
    assert sk.n == len(vals)
    assert max_rank_error(vals, sk) <= 0.02
    # the partials really are bounded rows, not data
    assert sum(len(r["items"]) for r in rows) < len(vals) / 2


def test_registry_entry_runs_and_is_monotone(spark, sf_dir):
    df = sketch_kll_order_prices(spark, sf_dir)
    rows = df.collect()
    assert [r["quantile"] for r in rows] == list(QUANTILES)
    ests = [r["estimate"] for r in rows]
    assert ests == sorted(ests)  # quantile estimates are monotone
    # determinism across invocations (fixed file layout)
    again = [r["estimate"] for r in sketch_kll_order_prices(spark, sf_dir).collect()]
    assert again == ests


class TestKMVSketch:
    def test_union_and_intersection_within_envelope(self, spark, sf_dir):
        """KMV estimates vs exact set sizes, computed independently in
        Python: |est_union - exact| and |est_inter - exact| must stay
        within 4 relative standard errors (1/sqrt(k-2)). The pairs
        share one doc population here, so errors are correlated — the
        bound applies per pair regardless."""
        from ethiopia_legal_etl_spark.operators.kmv import (
            _KMV_K,
            _KMV_TOKENS,
            sketch_kmv_cooccurrence,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
        members: dict = {t: set() for t in _KMV_TOKENS}
        for r in docs:
            toks = set(r["text"].split(" "))
            for t in _KMV_TOKENS:
                if t in toks:
                    members[t].add(r["doc_id"])

        rows = sketch_kmv_cooccurrence(spark, sf_dir).collect()
        assert len(rows) == 10
        tol = 4.0 / (_KMV_K - 2) ** 0.5
        for r in rows:
            a, b = members[r["tok_a"]], members[r["tok_b"]]
            exact_union, exact_inter = len(a | b), len(a & b)
            assert r["exact_cooccur"] == exact_inter
            if r["k_used"] < _KMV_K:  # degenerate: sketch IS the set
                assert r["est_union"] == exact_union
                assert r["est_intersection"] == r["n_both"] / r["k_used"] * exact_union
            else:
                assert abs(r["est_union"] - exact_union) <= tol * exact_union
                assert (
                    abs(r["est_intersection"] - exact_inter)
                    <= 2 * tol * exact_union
                )

    def test_degenerate_branch_is_exact(self, spark, tmp_path):
        """Sets smaller than k: the sketch IS the set, so est_union and
        est_intersection must be EXACT (the driver corpus is dense —
        every token set exceeds k at both SFs — so this branch needs a
        tiny synthetic corpus)."""
        from ethiopia_legal_etl_spark.operators.kmv import (
            _KMV_K,
            sketch_kmv_cooccurrence,
        )

        rows_in = [
            (0, "join hash"), (1, "join scan"), (2, "join hash scan"),
            (3, "hash window"), (4, "stream window join"), (5, "stream"),
        ]
        d = str(tmp_path / "kmv")
        spark.createDataFrame(
            rows_in, "doc_id long, text string"
        ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
        rows = sketch_kmv_cooccurrence(spark, d).collect()
        assert rows and all(r["k_used"] < _KMV_K for r in rows)
        got = {(r["tok_a"], r["tok_b"]): r for r in rows}
        r = got[("hash", "join")]
        # hash={0,2,3}, join={0,1,2,4}: union=5, inter=2
        assert r["est_union"] == 5.0
        assert r["n_both"] == 2 and r["exact_cooccur"] == 2
        assert r["est_intersection"] == 2 / 5 * 5.0
