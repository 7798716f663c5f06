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


def test_mad_consistent_with_quantiles_p50(rand_points):
    """value_mad_outliers' med must equal value_quantiles' p50 — both are
    the exact lower median by the same rank convention."""
    from btrdb_spark.operators.quantiles import value_mad_outliers, value_quantiles

    med = {r["uuid"]: r["med"] for r in value_mad_outliers(rand_points).collect()}
    p50 = {r["uuid"]: r["p50"] for r in value_quantiles(rand_points, pcts=(50,)).collect()}
    assert med == p50


def test_ewma_degenerates_at_alpha_one(rand_points):
    """alpha=1 makes the EWMA the identity: ewma == value everywhere."""
    from btrdb_spark.operators.resample import ewma

    out = ewma(rand_points, alpha=1.0).collect()
    assert all(r["ewma"] == r["value"] for r in out)


def test_sdt_huge_tolerance_keeps_only_endpoints(rand_points):
    """E larger than the value range: one door never closes, so only the
    first and last point of each stream survive."""
    from btrdb_spark.operators.compress import sdt_compress

    out = sdt_compress(rand_points, tolerance=1e9).collect()
    per_uuid = {}
    for r in out:
        per_uuid.setdefault(r["uuid"], []).append(r["time"])
    for u, ts in per_uuid.items():
        assert len(ts) <= 2, (u, ts)


def test_sdt_tiny_tolerance_keeps_everything(spark):
    """E below the smallest deviation from collinearity keeps every
    (deduped) point."""
    from btrdb_spark.operators.compress import sdt_compress

    rng = random.Random(5)
    rows = [("z", t, float(rng.randrange(100))) for t in range(50)]
    pts = spark.createDataFrame(rows, "uuid string, time long, value double")
    kept = sdt_compress(pts, tolerance=1e-9).count()
    assert kept == 50


def test_correlation_self_via_duplicate_stream(spark):
    """A stream duplicated under two uuids must correlate at exactly 1."""
    from btrdb_spark.operators.correlate import stream_correlations

    rng = random.Random(11)
    rows = []
    for i in range(40):
        v = rng.uniform(-100, 100)
        t = i * (1 << 20)
        rows += [("p", t, v), ("q", t, v)]
    pts = spark.createDataFrame(rows, "uuid string, time long, value double")
    out = stream_correlations(pts, pw=20, min_overlap=8).collect()
    assert len(out) == 1 and out[0]["corr"] == pytest.approx(1.0, abs=1e-9)


def test_stratified_sample_fraction_one_keeps_stratum(spark):
    from btrdb_spark.functions.pipeline import stratified_sample

    docs = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(500)], "doc_id long, lang string"
    )
    out = stratified_sample(docs, "lang", {"a": 1.0, "b": 0.0})
    ids = {r["doc_id"] for r in out.collect()}
    assert ids == {i for i in range(500) if i % 2}


def test_correlations_via_rollup_bit_identical(rand_points):
    """The ladder-fed correlation path must equal the raw-points path
    row-for-row: decimal partials fold to the same exact bucket means."""
    from btrdb_spark.operators.correlate import (
        stream_correlations,
        stream_correlations_via_rollup,
    )
    from btrdb_spark.plans.rollup import rollup_points

    raw = stream_correlations(rand_points, pw=6, min_overlap=4).collect()
    # versioned partials across two "commits", as the ladder stores them
    half1 = rand_points.filter(F.col("time") < 500)
    half2 = rand_points.filter(F.col("time") >= 500)
    level = rollup_points(half1, 4, versioned=True).unionByName(
        rollup_points(half2, 4, versioned=True)
    )
    via = stream_correlations_via_rollup(level, 4, pw=6, min_overlap=4).collect()
    assert [tuple(r) for r in raw] == [tuple(r) for r in via]
    assert len(raw) > 0


def test_diurnal_profile_hours_and_negative_times(spark):
    from btrdb_spark.operators.quantiles import diurnal_profile

    ns_h = 3_600_000_000_000
    rows = [
        ("d", 0, 1.0),               # hour 0
        ("d", 5 * ns_h + 7, 2.0),    # hour 5
        ("d", 29 * ns_h, 4.0),       # next day hour 5
        ("d", -1, 9.0),              # pre-1970: floor -> hour 23
    ]
    pts = spark.createDataFrame(rows, "uuid string, time long, value double")
    out = {r["hour"]: (r["cnt"], r["vmean"]) for r in diurnal_profile(pts).collect()}
    assert out[0] == (1, 1.0) and out[5] == (2, 3.0) and out[23] == (1, 9.0)
    # tz shift rotates the profile
    shifted = {r["hour"] for r in diurnal_profile(pts, tz_offset_hours=1).collect()}
    assert shifted == {1, 6, 0}


def test_decimate_extremes_match_aligned_windows(rand_points):
    """The decimated envelope's values per bucket ARE the StatPoint
    vmin/vmax — the two reads must tell one story."""
    from btrdb_spark.operators.decimate import decimate_minmax
    from btrdb_spark.operators.windows import aligned_windows

    pw = 6
    dec = decimate_minmax(rand_points, pw=pw).collect()
    env = {}
    for r in dec:
        k = (r["uuid"], (r["time"] >> pw) << pw)
        lo, hi = env.get(k, (r["value"], r["value"]))
        env[k] = (min(lo, r["value"]), max(hi, r["value"]))
    stats = {
        (r["uuid"], r["bucket_start"]): (r["vmin"], r["vmax"])
        for r in aligned_windows(rand_points, None, 0, 1 << 62, pw).collect()
    }
    assert env == stats


def test_window_quantiles_within_stat_envelope(rand_points):
    from btrdb_spark.operators.quantiles import window_quantiles
    from btrdb_spark.operators.windows import aligned_windows

    pw = 6
    q = {
        (r["uuid"], r["bucket_start"]): (r["p50"], r["p90"])
        for r in window_quantiles(rand_points, pw=pw, pcts=(50, 90)).collect()
    }
    stats = {
        (r["uuid"], r["bucket_start"]): (r["vmin"], r["vmax"])
        for r in aligned_windows(rand_points, None, 0, 1 << 62, pw).collect()
    }
    assert set(q) == set(stats)
    for k, (p50, p90) in q.items():
        vmin, vmax = stats[k]
        assert vmin <= p50 <= p90 <= vmax


def test_cusum_alarm_rows_are_stream_points(rand_points):
    from btrdb_spark.operators.resample import cusum_alarms

    pts = {(r["uuid"], r["time"], r["value"]) for r in rand_points.collect()}
    out = cusum_alarms(rand_points, k=0.5, h=4.0).collect()
    assert out, "tuned k/h should fire on the random fixture"
    for r in out:
        assert (r["uuid"], r["time"], r["value"]) in pts
        assert r["stat"] > 4.0


def test_peaks_are_bucket_maxima_of_their_neighborhood(rand_points):
    from btrdb_spark.operators.resample import find_peaks

    rows = sorted(
        rand_points.collect(), key=lambda r: (r["uuid"], r["time"], r["value"])
    )
    by_uuid = {}
    for r in rows:
        by_uuid.setdefault(r["uuid"], []).append(r)
    got = {(r["uuid"], r["time"]) for r in find_peaks(rand_points, w=2).collect()}
    want = set()
    for u, rs in by_uuid.items():
        for i, r in enumerate(rs):
            neigh = rs[max(0, i - 2) : i] + rs[i + 1 : i + 3]
            if neigh and all(r["value"] > x["value"] for x in neigh):
                want.add((u, r["time"]))
    assert got == want


def test_time_weighted_mean_conserves_held_time(rand_points):
    """Every stream's held_ns must sum EXACTLY to (end - first_hold_start):
    segment splitting at bucket edges may never lose or double-count a
    nanosecond."""
    from btrdb_spark.operators.resample import time_weighted_mean

    start, end = 0, 1024
    out = time_weighted_mean(rand_points, start, end, pw=6).collect()
    held = {}
    for r in out:
        held[r["uuid"]] = held.get(r["uuid"], 0) + r["held_ns"]
    first = {}
    for r in rand_points.collect():
        t = max(min(r["time"], end), start)
        first[r["uuid"]] = min(first.get(r["uuid"], end), t)
    for u, h in held.items():
        assert h == end - first[u], (u, h, end - first[u])


def test_time_weighted_mean_within_value_range(rand_points):
    from btrdb_spark.operators.resample import time_weighted_mean

    vals = {}
    for r in rand_points.collect():
        vals.setdefault(r["uuid"], []).append(r["value"])
    for r in time_weighted_mean(rand_points, 0, 1024, pw=6).collect():
        lo, hi = min(vals[r["uuid"]]), max(vals[r["uuid"]])
        assert lo - 1e-6 <= r["vtwmean"] <= hi + 1e-6
