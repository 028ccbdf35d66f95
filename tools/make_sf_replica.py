"""Materialize an sfN-equivalent dataset by key-consistent replication
of an existing sf dir (default: sf0.1 ×10 ≈ sf1). The driver provides
no sf1 parquet, and /root/testdata is read-only, so the only honest way
to give the bench a 10×-data point is derived data in scratch.

Key domains shift CONSISTENTLY across tables (copy i adds i×|domain|
to orderkey/custkey/partkey/suppkey on every table referencing them),
so join cardinalities scale like a real bigger database instead of
degenerating. Fixed-size dims (nation, region) are copied verbatim —
exactly how TPC-H itself scales.

Usage: python tools/make_sf_replica.py OUT_DIR [--factor 10] [--src /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from ethiopia_legal_etl_spark.session import get_spark  # noqa: E402

# table -> {column: key_domain}; domains owned by the dim that defines them
SHIFTS = {
    "lineitem": {"l_orderkey": "orderkey", "l_partkey": "partkey", "l_suppkey": "suppkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}
DOMAIN_OWNER = {
    "orderkey": ("orders", "o_orderkey"),
    "custkey": ("customer", "c_custkey"),
    "partkey": ("part", "p_partkey"),
    "suppkey": ("supplier", "s_suppkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}
VERBATIM = ("nation", "region")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    spark = get_spark(app_name="make-sf-replica")
    offsets = {
        dom: spark.read.parquet(f"{args.src}/{t}.parquet").agg(F.max(c)).first()[0] + 1
        for dom, (t, c) in DOMAIN_OWNER.items()
    }
    for t in VERBATIM:
        spark.read.parquet(f"{args.src}/{t}.parquet").write.mode("overwrite").parquet(
            f"{args.out_dir}/{t}.parquet"
        )
    for t, cols in SHIFTS.items():
        base = spark.read.parquet(f"{args.src}/{t}.parquet")
        parts = []
        for i in range(args.factor):
            p = base
            for c, dom in cols.items():
                p = p.withColumn(c, F.col(c) + F.lit(i * offsets[dom]))
            parts.append(p)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        n_files = max(8, args.factor * 2)
        out.repartition(n_files).write.mode("overwrite").parquet(
            f"{args.out_dir}/{t}.parquet"
        )
        print(f"{t}: x{args.factor} -> {args.out_dir}/{t}.parquet")


if __name__ == "__main__":
    main()
