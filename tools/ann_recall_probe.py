"""ANN recall/cost curve at replica scale (VERDICT r4 #6).

The recall gates in tests/test_dedup_similarity.py are pinned at small
SFs; this probe measures recall AND candidate volume for every ANN
variant at the base dir and at an N× key-shifted replica of the
embeddings table, proving the gates are a property of the method, not
an artifact of the small corpus.

Replica semantics: copy i shifts vec_id by i*|domain| (same scheme as
make_sf_replica.py) but keeps vectors VERBATIM, so each query vector
gains factor-1 exact duplicates (cos=1 neighbors). That is the
realistic hard case for ANN recall accounting — near-duplicate mass
concentrates at the top of every true top-k list — and both the brute
ground truth and the ANN variants see the identical corpus, so
recall@k stays apples-to-apples.

Usage: python tools/ann_recall_probe.py [--src /root/testdata/sf0.1]
         [--factor 10] [--scratch /tmp/ann_replica] [--k 10]
Prints one JSON line per (variant, scale) with recall, candidate
rows, and wall seconds.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from ethiopia_legal_etl_spark.session import get_spark  # noqa: E402


def brute_topk(spark, d, k):
    from ethiopia_legal_etl_spark.operators.similarity import (
        similarity_cosine_topk,
    )

    rows = similarity_cosine_topk(spark, d).where(F.col("rn") <= k).collect()
    return {(r["q_id"], r["vec_id"]) for r in rows}


def measure(spark, d, k):
    from ethiopia_legal_etl_spark.operators.similarity import (
        similarity_ivf_by_label,
        similarity_ivf_kmeans,
        similarity_lsh_buckets,
        similarity_lsh_tuned,
    )

    n_vecs = spark.read.parquet(f"{d}/embeddings.parquet").count()
    t0 = time.perf_counter()
    truth = brute_topk(spark, d, k)
    brute_sec = time.perf_counter() - t0
    out = [
        {
            "variant": "brute_force",
            "n_vecs": n_vecs,
            "recall": 1.0,
            "candidates": n_vecs * len({q for q, _ in truth}),
            "sec": round(brute_sec, 2),
        }
    ]
    for name, fn, is_topk in (
        ("lsh_buckets", similarity_lsh_buckets, False),
        ("lsh_tuned", similarity_lsh_tuned, False),
        ("ivf_by_label", similarity_ivf_by_label, True),
        ("ivf_kmeans", similarity_ivf_kmeans, True),
    ):
        t0 = time.perf_counter()
        rows = fn(spark, d).collect()
        sec = time.perf_counter() - t0
        got = {(r["q_id"], r["vec_id"]) for r in rows}
        if is_topk:
            recall = len(truth & got) / len(truth)
        else:
            # LSH emits a candidate set, not a top-k: recall = fraction
            # of true top-k pairs surviving into the candidate set
            recall = len(truth & got) / len(truth)
        out.append(
            {
                "variant": name,
                "n_vecs": n_vecs,
                "recall": round(recall, 4),
                "candidates": len(rows),
                "sec": round(sec, 2),
            }
        )
    return out


def build_replica(spark, src, scratch, factor):
    emb = spark.read.parquet(f"{src}/embeddings.parquet")
    offset = emb.agg(F.max("vec_id")).first()[0] + 1
    parts = [
        emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * offset))
        for i in range(factor)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(max(8, factor * 2)).write.mode("overwrite").parquet(
        f"{scratch}/embeddings.parquet"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--scratch", default="/tmp/ann_replica")
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    spark = get_spark(app_name="ann-recall-probe")
    for scale, d in (("1x", args.src), (f"{args.factor}x", args.scratch)):
        if scale != "1x":
            build_replica(spark, args.src, args.scratch, args.factor)
        for rec in measure(spark, d, args.k):
            rec["scale"] = scale
            print(json.dumps(rec))


if __name__ == "__main__":
    main()
