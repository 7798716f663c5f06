"""Cross-operator consistency properties on randomized small inputs.

These tie the new operators to the established ones: when parameters
degenerate, the answers must agree row-for-row — the same strategy the
engine ladder uses (rollup path == raw path, test_engine_ladder).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from btrdb_spark.operators.windows import windows, windows_sliding


@pytest.fixture(scope="module")
def rand_points(spark):
    rng = random.Random(77)
    rows = [
        (str(rng.randrange(4)), rng.randrange(0, 1000), round(rng.uniform(-50, 50), 3), 10)
        for _ in range(600)
    ]
    return spark.createDataFrame(
        rows, "uuid string, time long, value double, version long"
    ).cache()


def test_sliding_hop_eq_width_matches_tumbling(rand_points):
    """hop == width degenerates sliding windows to A2 minus the hole rows."""
    tumb = {
        (r["uuid"], r["window_start"]): (r["cnt"], r["vmin"], r["vmean"], r["vmax"])
        for r in windows(rand_points, None, 0, 1000, width=100).collect()
        if r["cnt"] > 0
    }
    slid = {
        (r["uuid"], r["window_start"]): (r["cnt"], r["vmin"], r["vmean"], r["vmax"])
        for r in windows_sliding(rand_points, None, 0, 1000, width=100, hop=100).collect()
    }
    assert slid == tumb


def test_sliding_total_mass(rand_points):
    """With hop h and width w=k*h, every in-range point lands in exactly k
    windows (edges aside): total cnt == k * points once the range interior
    is wide enough. Checked on the interior windows only."""
    w, h = 200, 50
    out = windows_sliding(rand_points, None, 0, 1000, width=w, hop=h).collect()
    # interior points (time in [w, end-w)) are covered by exactly w/h windows
    interior = rand_points.filter((F.col("time") >= w) & (F.col("time") < 1000 - w)).count()
    covered = sum(
        r["cnt"] for r in out if w <= r["window_start"] < 1000 - 2 * w
    )
    # every interior window's points are interior points counted w/h times;
    # the inequality direction is what the mass-conservation bound gives
    assert covered <= (w // h) * interior


def test_resample_linear_equals_locf_where_no_next(spark):
    from btrdb_spark.operators.resample import resample_linear, resample_locf

    pts = spark.createDataFrame(
        [("a", 100, 5.0, 10)], "uuid string, time long, value double, version long"
    )
    uuids = pts.select("uuid").distinct()
    lin = {r["grid_time"]: r["value"] for r in resample_linear(pts, uuids, 0, 400, 100).collect()}
    locf = {r["grid_time"]: r["value"] for r in resample_locf(pts, uuids, 0, 400, 100).collect()}
    # after the last point both resamplers carry the value; before the
    # first point both are NULL
    assert lin == locf


def test_chunk_reconstruction(spark):
    """stride == chunk_tokens (no overlap) chunks reassemble the document."""
    from btrdb_spark.functions.chunking import doc_chunk

    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(23)))], "doc_id long, text string"
    )
    chunks = doc_chunk(docs, chunk_tokens=5, stride=5).orderBy("chunk_ix").collect()
    assert " ".join(c["chunk_text"] for c in chunks) == docs.collect()[0]["text"]
    assert sum(c["n_chunk_tokens"] for c in chunks) == 23
