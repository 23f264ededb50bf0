import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_MID = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from shifu_spark.session import get_spark

    s = get_spark("shifu_spark_tests", shuffle_partitions="8")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
