from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(0, "/root/repo")

from btrdb_spark.session import get_spark

# Two-tier test contract (VERDICT r12 #4): tests whose measured solo
# duration exceeds SLOW_SECONDS are auto-marked `slow` from the committed
# ledger (tests/durations.json, regenerated from a full -q --durations=0
# run), so the default tier — what the driver's fixed budget runs via
# pytest.ini addopts `-m "not slow"` — finishes in ~10 min while the
# full tier (`-m ""`) keeps every soak. Data-driven marking keeps the
# tier split reproducible and reviewable in one place; tests absent from
# the ledger (new or trivial) default to the fast tier.
SLOW_SECONDS = 12.0
_LEDGER = os.path.join(os.path.dirname(__file__), "durations.json")


def pytest_collection_modifyitems(config, items):
    try:
        with open(_LEDGER) as f:
            durs = json.load(f)
    except (OSError, ValueError):
        return
    for item in items:
        nodeid = item.nodeid.replace(os.sep, "/")
        if not nodeid.startswith("tests/"):
            nodeid = "tests/" + nodeid.split("tests/")[-1]
        if durs.get(nodeid, 0.0) >= SLOW_SECONDS:
            item.add_marker(pytest.mark.slow)


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
