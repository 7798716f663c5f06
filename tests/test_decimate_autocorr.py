"""Semantic tests for min/max plot decimation and stream autocorrelation."""

from __future__ import annotations

from pyspark.sql import functions as F

from btrdb_spark.operators import correlate, decimate


def _pts(spark, rows):
    return spark.createDataFrame(
        [(u, int(t), float(v), 10) for (u, t, v) in rows],
        "uuid string, time long, value double, version long",
    )


def test_decimate_keeps_bucket_extremes(spark):
    # one stream, one 2^4=16ns bucket with 4 points
    pts = _pts(spark, [("a", 0, 5.0), ("a", 3, -1.0), ("a", 7, 9.0), ("a", 9, 2.0)])
    out = {(r["time"], r["value"]) for r in decimate.decimate_minmax(pts, pw=4).collect()}
    assert out == {(3, -1.0), (7, 9.0)}


def test_decimate_single_point_bucket_emits_once(spark):
    pts = _pts(spark, [("a", 5, 1.5)])
    out = decimate.decimate_minmax(pts, pw=4).collect()
    assert len(out) == 1 and out[0]["value"] == 1.5


def test_decimate_ties_break_to_earliest_time(spark):
    # two points share the max value -> earliest wins; same for min
    pts = _pts(spark, [("a", 1, 7.0), ("a", 4, 7.0), ("a", 2, 0.0), ("a", 8, 0.0)])
    out = {(r["time"], r["value"]) for r in decimate.decimate_minmax(pts, pw=4).collect()}
    assert out == {(1, 7.0), (2, 0.0)}


def test_decimate_respects_range_and_buckets(spark):
    pts = _pts(spark, [("a", 0, 1.0), ("a", 16, 2.0), ("a", 40, 3.0)])
    out = decimate.decimate_minmax(pts, start=0, end=32, pw=4)
    assert {r["time"] for r in out.collect()} == {0, 16}


def test_decimate_output_bounded_by_two_per_bucket(spark):
    rows = [("a", t, float((t * 37) % 101)) for t in range(0, 256)]
    pts = _pts(spark, rows)
    out = decimate.decimate_minmax(pts, pw=5)  # 8 buckets of 32 points
    assert out.count() <= 16


def test_autocorr_periodic_signal(spark):
    # period-2 alternating bucket means: lag2 corr ~ +1, lag1 corr ~ -1
    rows = [("a", b * 16 + 1, 1.0 if b % 2 == 0 else -1.0) for b in range(64)]
    pts = _pts(spark, rows)
    out = {
        r["lag"]: r["corr"]
        for r in correlate.stream_autocorr(pts, pw=4, lags=(1, 2), min_overlap=4).collect()
    }
    assert out[2] > 0.99
    assert out[1] < -0.99


def test_autocorr_min_overlap_filters(spark):
    rows = [("a", b * 16, float(b % 3)) for b in range(5)]
    pts = _pts(spark, rows)
    out = correlate.stream_autocorr(pts, pw=4, lags=(1,), min_overlap=10).collect()
    assert out == []


def test_find_peaks_basic(spark):
    from btrdb_spark.operators import resample as rs

    pts = _pts(spark, [("a", t, v) for t, v in enumerate([0, 1, 5, 1, 0, 2, 8, 2, 0])])
    out = {(r["time"], r["value"], r["prominence"]) for r in rs.find_peaks(pts, w=2).collect()}
    assert out == {(2, 5.0, 4.0), (6, 8.0, 6.0)}


def test_find_peaks_plateau_no_peak(spark):
    from btrdb_spark.operators import resample as rs

    # equal neighboring maxima: strict rule -> no peak on the plateau
    pts = _pts(spark, [("a", t, v) for t, v in enumerate([0, 5, 5, 0])])
    assert rs.find_peaks(pts, w=2).collect() == []


def test_find_peaks_min_value_floor(spark):
    from btrdb_spark.operators import resample as rs

    pts = _pts(spark, [("a", t, v) for t, v in enumerate([0, 3, 0, 0, 9, 0])])
    out = rs.find_peaks(pts, w=1, min_value=5.0).collect()
    assert [(r["time"], r["value"]) for r in out] == [(4, 9.0)]


def test_stream_availability_gap_accounting(spark):
    from btrdb_spark.operators import resample as rs

    # range [0, 100), max_gap 10:
    # stream a: points at 5, 20, 80 -> lead-in 5 (<=10, ok), gap 5->20 = 15
    # (down), gap 20->80 = 60 (down), tail 100-80 = 20 (down)
    pts = _pts(spark, [("a", 5, 1.0), ("a", 20, 1.0), ("a", 80, 1.0)])
    out = rs.stream_availability(pts, 0, 100, max_gap=10).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_gaps"] == 3 and r["downtime_ns"] == 15 + 60 + 20
    assert r["availability"] == 1.0 - 95 / 100.0


def test_stream_availability_dense_stream_full(spark):
    from btrdb_spark.operators import resample as rs

    pts = _pts(spark, [("b", t, 0.0) for t in range(0, 100, 5)])
    r = rs.stream_availability(pts, 0, 100, max_gap=10).collect()[0]
    assert r["n_gaps"] == 0 and r["downtime_ns"] == 0 and r["availability"] == 1.0
