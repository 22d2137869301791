from __future__ import annotations

import pytest

from irstats2_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("irstats2_spark_tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()
