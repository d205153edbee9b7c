from __future__ import annotations

import pytest

from rsbsa_etl_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="rsbsa_tests", cpus=4, shuffle_partitions=8)
    yield s
    s.stop()


SF_DIR = "/root/testdata/sf0.001"
SF01_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
