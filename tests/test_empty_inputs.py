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
