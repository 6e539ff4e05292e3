import os

import pytest


@pytest.fixture(scope="session")
def spark():
    from feasts_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    s = get_spark(cores=os.environ["SPARK_GRAFT_CPUS"], app_name="feasts_spark_tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
