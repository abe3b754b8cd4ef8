"""Shared Spark session for the test suite."""

from __future__ import annotations

import pytest

from prom_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="prom_spark_tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.autoBroadcastJoinThreshold": str(8 * 1024 * 1024)},
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
