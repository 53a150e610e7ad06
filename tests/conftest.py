from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from cascading_hive_spark.session import get_session

    s = get_session("tests", master="local[8]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
