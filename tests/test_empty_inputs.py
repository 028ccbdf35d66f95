"""Empty-input robustness: every registered query must run (not throw)
when every source table has zero rows — exactly what a
partition-pruned-to-nothing scan produces at scale (a date predicate
outside the data range, an empty ingest increment). Schemas are
preserved; only rows are removed.

Runs at session scope against one shared empty mirror; ~2s/query.
"""

import pytest

from ethiopia_legal_etl_spark.operators.registry import all_queries
from ethiopia_legal_etl_spark.schemas import TABLE_NAMES


@pytest.fixture(scope="module")
def empty_dir(spark, sf_dir, tmp_path_factory):
    dst = tmp_path_factory.mktemp("empty_tables")
    for t in TABLE_NAMES:
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        df.limit(0).write.mode("overwrite").parquet(str(dst / f"{t}.parquet"))
    return str(dst)


def test_every_query_survives_empty_tables(spark, empty_dir):
    failures = []
    for name, q in sorted(all_queries().items()):
        try:
            q.builder(spark, empty_dir).count()
        except Exception as e:  # noqa: BLE001 - collecting all failures
            failures.append(f"{name}: {type(e).__name__}")
    assert not failures, failures


def test_null_text_payload_rows_survive(spark, sf_dir, tmp_path_factory, monkeypatch):
    """r9 text-null mirror class: a document row with NULL text (failed
    fetch/extraction — routine at corpus scale) must pass through the
    Python-stage operators without crashing an executor, with pinned
    no-op semantics. (The cross-engine VALUE checks live in the null
    mirror gate — tools/nulls_mirror.py now nullifies text; this pins
    the no-crash contract in CI.)"""
    import pyspark.sql.functions as F

    import ethiopia_legal_etl_spark.operators.multimodal as mm
    import ethiopia_legal_etl_spark.operators.textguard as tg
    import ethiopia_legal_etl_spark.operators.webarchive as wa

    base = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(6)
    docs = base.withColumn(
        "text", F.when(F.col("doc_id") % 2 == 0, F.col("text"))
    )  # every even doc keeps text, every odd doc gets NULL
    for mod in (mm, tg, wa):
        monkeypatch.setattr(mod, "load_table", lambda *_, **__: docs)

    # decode stub: NULL payload -> all-null metadata row, not a crash
    meta = mm.extract_media_metadata(mm.media_table(spark, sf_dir)).collect()
    assert len(meta) == 6
    assert all(r["byte_len"] is None for r in meta if r["doc_id"] % 2 == 1)

    # fake embed: NULL payload -> NULL embedding, avg skips it
    assert mm.multimodal_fake_embed(spark, sf_dir).count() > 0

    # mojibake: NULL text -> untouched no-op row
    rows = {r["doc_id"]: r for r in tg.text_mojibake_repair(spark, sf_dir).collect()}
    assert len(rows) == 6
    for d, r in rows.items():
        if d % 2 == 1:
            assert (r["was_corrupted"], r["n_passes"], r["len_delta"]) == (False, 0, 0)

    # WARC builder: NULL text -> empty page body, never the str "None"
    out = {r["doc_id"]: r for r in wa.warc_to_text_pipeline(spark, sf_dir).collect()}
    assert len(out) == 6
    for d, r in out.items():
        if d % 2 == 1:
            # each record strips to "Page {i} & more" (13 chars for
            # single-digit i); an f-string "None" body would add 5
            assert r["total_len"] == 13 * r["n_records"], (d, r)


@pytest.fixture(scope="module")
def null_mirror_dir(sf_dir, tmp_path_factory):
    """The standing null-injected mirror, built in-process by the tool
    (tools/nulls_mirror.py — ~10% deterministic NULLs across 20
    nullable columns in 8 tables)."""
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "nulls_mirror",
        Path(__file__).resolve().parent.parent / "tools" / "nulls_mirror.py",
    )
    nm = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(nm)
    dst = tmp_path_factory.mktemp("null_mirror")
    nm.build(str(dst), src=sf_dir)
    return str(dst)


def test_null_mirror_sentinels_stay_green(spark, null_mirror_dir):
    """CI pin for the null/corruption-mirror divergence classes (the
    FULL mirror gate is a ~13-min tool run; this keeps every fixed
    class from silently regressing on every pytest run): one sentinel
    per fixed class — the r9 NULL classes (null GROUP dropped by an
    equi-join oracle, NULL_MAP_KEY, all-null STRING_AGG vs
    array_join, NULLS FIRST/LAST trim flip, None-payload UDF crashes,
    f-string 'None', implicit batch membership, aggregate(NULL) fold,
    explode_outer's null row, regexp over NULL, the ml
    array_to_vector subexpression-elimination NPE) plus the r10
    CORRUPTION classes (malformed JSON, wrong-dim embeddings,
    non-finite coordinates, non-finite measures — see the inline
    comments below)."""
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "check_oracle_ci",
        Path(__file__).resolve().parent.parent / "tools" / "check_oracle.py",
    )
    co = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(co)
    sentinels = [
        "stats_skew_kurtosis", "map_hof_event_profile",
        "event_pattern_funnels", "robust_trimmed_mean",
        "batch_padding_waste", "doc_fingerprint_rolling",
        "explode_outer_rare_tokens", "sql_udf_year_extract",
        "multimodal_fake_embed", "text_mojibake_repair",
        "warc_to_text_pipeline", "similarity_lsh_buckets",
        "similarity_ivf_by_label",
        # r10 corruption axis (malformed JSON in events.props): Spark
        # get_json_object / try_parse_json yield NULL where DuckDB
        # json_extract raises — oracles carry a json_valid guard
        "scalar_json_events", "variant_event_props",
        # r10 truncation axis (wrong-dim embeddings, EMB_DIM policy):
        # one sentinel per failure shape — DuckDB cosine raise,
        # Spark element_at raise, pyspark.ml fit crash (lsh_buckets,
        # already above), and the silent moment-bias case
        "embedding_near_dup_cosine", "embedding_int8_quantize",
        "embedding_silhouette_labels",
        # r10 non-finite axis (NaN/Inf coordinate): Spark NaN cosine
        # vs DuckDB -1.0, and the NULL-l2 contract for the one entry
        # that keeps failed-encoder rows
        "embedding_norms",
        # r10 non-finite MEASURE axis (NaN/Inf in events.value): one
        # sentinel per failure shape — Spark ANSI ARITHMETIC_OVERFLOW
        # on the fixed-point cents cast (welch), DuckDB NaN->INT64
        # ConversionException on the lattice cast (psi bins), the
        # SILENT order-statistic shift (both engines sort NaN
        # greatest: median CI), and the entry's own raise_error bound
        # guard tripping on Inf (rolling zscore)
        "experiment_welch_effect", "drift_psi_decile_bins",
        "median_ci_order_stats", "anomaly_rolling_zscore",
    ]
    failures, _ = co.run(null_mirror_dir, sentinels, spark=spark, count_warns=True)
    assert failures == 0
