from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
# Executor python workers must resolve the package AND test modules
# (cloudpickle serializes test-defined fakes by reference)
os.environ["PYTHONPATH"] = os.pathsep.join(
    [str(REPO), str(REPO / "tests"), os.environ.get("PYTHONPATH", "")]
)

from ethiopia_legal_etl_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    spark = get_spark(
        app_name="ethiopia-legal-etl-spark-tests",
        shuffle_partitions=8,
        extra_conf={
            # static conf: must be set at session creation (bucketed tables)
            "spark.sql.warehouse.dir": str(tmp_path_factory.mktemp("warehouse")),
        },
    )
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
