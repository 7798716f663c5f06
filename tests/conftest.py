from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from btrdb_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("btrdb_spark_tests", cpus=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def make_points(spark):
    """Build a points DF from (uuid, time, value, version) tuples."""

    def _make(rows):
        return spark.createDataFrame(
            [(str(u), int(t), float(v), int(ver)) for (u, t, v, ver) in rows],
            "uuid string, time long, value double, version long",
        )

    return _make


@pytest.fixture(scope="session")
def make_deletes(spark):
    def _make(rows):
        return spark.createDataFrame(
            [(str(u), int(s), int(e), int(v)) for (u, s, e, v) in rows],
            "uuid string, start long, end long, version long",
        )

    return _make
