import os
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from sklearn_raster_spark.session import get_spark

    spark = get_spark(app_name="tests", master="local[4]", extra_conf={
        "spark.sql.shuffle.partitions": "4",
        "spark.default.parallelism": "4",
    })
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
