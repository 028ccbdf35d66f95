"""Sharded training-corpus layout (sources/shards.py): determinism,
balance, manifest integrity, partition-pruned reads."""

from __future__ import annotations

from pyspark.sql import functions as F

from ethiopia_legal_etl_spark.plans.explain import formatted_plan
from ethiopia_legal_etl_spark.sources.shards import (
    assign_shard,
    read_corpus_shards,
    read_manifest,
    write_corpus_sharded,
)
from ethiopia_legal_etl_spark.sources.tables import load_table

N_SHARDS = 8


def test_shard_write_roundtrip_and_manifest(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "corpus")
    manifest = write_corpus_sharded(docs, path, n_shards=N_SHARDS)

    back = read_corpus_shards(spark, path)
    assert back.count() == docs.count()
    # shard column matches the formula for every row
    mismatch = back.where(
        F.col("shard").cast("long") != assign_shard(N_SHARDS)
    ).count()
    assert mismatch == 0
    # manifest sums equal corpus totals, and matches the file on disk
    assert sum(s["n_docs"] for s in manifest["shards"]) == docs.count()
    total_tokens = docs.select(
        F.sum(F.size(F.split("text", " ")))
    ).first()[0]
    assert sum(s["n_tokens"] for s in manifest["shards"]) == total_tokens
    assert read_manifest(path) == manifest


def test_shard_balance_is_hash_uniform(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "corpus")
    manifest = write_corpus_sharded(docs, path, n_shards=N_SHARDS)
    counts = [s["n_docs"] for s in manifest["shards"]]
    assert len(counts) == N_SHARDS  # every shard non-empty at 500 docs
    mean = sum(counts) / len(counts)
    # hash-uniform: no shard deviates more than 40% from the mean
    # (binomial 3-sigma at n=500, p=1/8 is ~±21%)
    assert all(abs(c - mean) / mean < 0.4 for c in counts)


def test_shard_contents_are_deterministic_across_writes(
    spark, sf_dir, tmp_path
):
    docs = load_table(spark, sf_dir, "documents")
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_corpus_sharded(docs, a, n_shards=N_SHARDS)
    # second write from a differently-partitioned input
    write_corpus_sharded(docs.repartition(13), b, n_shards=N_SHARDS)
    for shard in (0, N_SHARDS - 1):
        rows_a = [
            r["doc_id"]
            for r in spark.read.parquet(f"{a}/shard={shard}").collect()
        ]
        rows_b = [
            r["doc_id"]
            for r in spark.read.parquet(f"{b}/shard={shard}").collect()
        ]
        assert rows_a == rows_b  # same membership AND same order
        assert rows_a != sorted(rows_a)  # order is shuffled, not by id


def test_shard_subset_read_prunes_partitions(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "corpus")
    write_corpus_sharded(docs, path, n_shards=N_SHARDS)
    subset = read_corpus_shards(spark, path, shards=[2, 5])
    plan = formatted_plan(subset)
    assert "PartitionFilters" in plan and "shard" in plan
    got = {r["shard"] for r in subset.select("shard").distinct().collect()}
    assert got == {2, 5}


def test_shard_assignment_is_stable_under_corpus_growth(spark, sf_dir):
    """Appending documents must not move existing ones between shards:
    the assignment depends only on doc_id, never on corpus contents."""
    docs = load_table(spark, sf_dir, "documents")
    before = {
        r["doc_id"]: r["s"]
        for r in docs.select(
            "doc_id", assign_shard(N_SHARDS).alias("s")
        ).collect()
    }
    grown = docs.unionByName(
        docs.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    )
    after = {
        r["doc_id"]: r["s"]
        for r in grown.select(
            "doc_id", assign_shard(N_SHARDS).alias("s")
        ).collect()
    }
    assert all(after[k] == v for k, v in before.items())
