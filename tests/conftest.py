import pytest

from transferia_spark import get_spark


@pytest.fixture(scope="session")
def spark():
    return get_spark("transferia_spark_tests")


SF_DIR = "/root/testdata/sf0.001"
SF01_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
