"""Behavioral tests for graph_triangle_count (oracle parity is
covered by check_oracle)."""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F

from ethiopia_legal_etl_spark.operators.webarchive import graph_triangle_count


def test_triangle_count_matches_bruteforce(spark, sf_dir):
    """Independent model: enumerate ALL 3-subsets of the <=50-node host
    graph in Python and count per-host triangle membership + degree."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    edges = set()
    for r in docs.select("doc_id").collect():
        d = r["doc_id"]
        src = d % 50
        for i in range(1 + d % 3):
            dst = (src * 7 + i * 13 + 1) % 50
            if src != dst:
                edges.add((min(src, dst), max(src, dst)))
    nodes = sorted({n for e in edges for n in e})
    tri_of = {n: 0 for n in nodes}
    n_tri = 0
    for a, b, c in combinations(nodes, 3):
        if (a, b) in edges and (b, c) in edges and (a, c) in edges:
            n_tri += 1
            tri_of[a] += 1
            tri_of[b] += 1
            tri_of[c] += 1
    deg = {n: sum(1 for e in edges if n in e) for n in nodes}

    rows = {r["host"]: r for r in graph_triangle_count(spark, sf_dir).collect()}
    assert set(rows) == set(nodes)
    assert sum(r["n_triangles"] for r in rows.values()) == 3 * n_tri
    for n in nodes:
        assert rows[n]["n_triangles"] == tri_of[n]
        assert rows[n]["degree"] == deg[n]
        if deg[n] >= 2:
            assert rows[n]["clustering"] == 2 * tri_of[n] / (
                deg[n] * (deg[n] - 1)
            )
            assert 0 <= rows[n]["clustering"] <= 1

