"""resample_linear, rolling_zscore, global_shuffle unit semantics."""

from __future__ import annotations

import math

import pytest

from btrdb_spark.functions import pipeline
from btrdb_spark.operators import resample as rs


@pytest.fixture(scope="module")
def pts(spark):
    rows = [
        ("a", 0, 0.0, 10),
        ("a", 100, 10.0, 10),
        ("a", 200, 30.0, 10),
        ("b", 50, 5.0, 10),
    ]
    return spark.createDataFrame(rows, "uuid string, time long, value double, version long")


def test_resample_linear_interpolates_and_edges(spark, pts):
    uuids = pts.select("uuid").distinct()
    out = {
        (r["uuid"], r["grid_time"]): r["value"]
        for r in rs.resample_linear(pts, uuids, 0, 250, 50).collect()
    }
    assert out[("a", 0)] == 0.0          # exact point -> itself
    assert out[("a", 50)] == 5.0         # midway 0..100 of 0..10
    assert out[("a", 150)] == 20.0       # midway 100..200 of 10..30
    assert out[("a", 200)] == 30.0
    assert out[("b", 0)] is None         # before first point -> NULL
    assert out[("b", 100)] == 5.0        # LOCF tail after last point
    assert out[("b", 200)] == 5.0


def test_rolling_zscore_window_math(spark):
    # stream of 1..25: after 20 rows the window is full
    rows = [("s", i, float(i), 10) for i in range(1, 26)]
    df = spark.createDataFrame(rows, "uuid string, time long, value double, version long")
    out = {r["time"]: r for r in rs.rolling_zscore(df, window_rows=20).collect()}
    assert out[5]["z"] is None and out[5]["n_window"] == 5    # frame not full
    r20 = out[20]
    assert r20["n_window"] == 20
    # window holds 1..20: mean 10.5, sample var 35, z = (20-10.5)/sqrt(35)
    assert r20["mean_w"] == pytest.approx(10.5)
    assert r20["z"] == pytest.approx((20 - 10.5) / math.sqrt(35.0))


def test_rolling_zscore_constant_window_null(spark):
    rows = [("s", i, 7.0, 10) for i in range(30)]
    df = spark.createDataFrame(rows, "uuid string, time long, value double, version long")
    assert all(r["z"] is None for r in rs.rolling_zscore(df, window_rows=20).collect())


def test_rolling_zscore_all_null_frame_is_null_not_zero(spark):
    # r13 prefix-difference rewrite: a frame of ONLY null values must keep
    # sum semantics (mean_w NULL), even when earlier rows held values — a
    # naive running-sum difference would yield 0 there. n_window still
    # counts rows (count(1) over the frame, nulls included).
    rows = [("s", i, 1.0, 10) for i in range(5)] + [
        ("s", 5 + i, None, 10) for i in range(8)
    ]
    df = spark.createDataFrame(rows, "uuid string, time long, value double, version long")
    out = {r["time"]: r for r in rs.rolling_zscore(df, window_rows=3).collect()}
    # frame {1.0, null, null}: s = 1.0 over n = 3 frame rows
    assert out[6]["mean_w"] == pytest.approx(1.0 / 3.0)
    r9 = out[9]  # frame {null, null, null}: all-null -> NULL mean, full count
    assert r9["mean_w"] is None and r9["z"] is None and r9["n_window"] == 3


def test_global_shuffle_deterministic_total_order(spark):
    docs = spark.createDataFrame([(i, "x") for i in range(100)], "doc_id long, text string")
    a = [(r["doc_id"], r["shard"], r["pos_in_shard"])
         for r in pipeline.global_shuffle(docs, n_shards=8).collect()]
    b = [(r["doc_id"], r["shard"], r["pos_in_shard"])
         for r in pipeline.global_shuffle(docs.repartition(7), n_shards=8).collect()]
    assert a == b                        # partitioning-independent
    assert len({(s, p) for _, s, p in a}) == 100   # slots are unique
    c = [r["doc_id"] for r in pipeline.global_shuffle(docs, n_shards=8, salt="v2").collect()]
    assert c != [x[0] for x in a]        # a new salt reshuffles


def test_window_quantiles_exact_ranks(spark, make_points):
    from btrdb_spark.operators import quantiles as qt

    # one bucket (pw=6 covers 0..63) with values 1..10: p50 -> rank
    # floor(50*9/100)+1 = 5 -> value 5.0; p90 -> rank floor(810/100)+1=9
    rows = [("a", t, float(t + 1), 10) for t in range(10)]
    out = qt.window_quantiles(make_points(rows), pw=6, pcts=(50, 90)).collect()
    assert len(out) == 1
    assert out[0]["p50"] == 5.0 and out[0]["p90"] == 9.0


def test_window_quantiles_buckets_independent(spark, make_points):
    from btrdb_spark.operators import quantiles as qt

    rows = [("a", t, float(t), 10) for t in range(8)]        # bucket 0: 0..7
    rows += [("a", 8 + t, 100.0 + t, 10) for t in range(8)]  # bucket 1: 100..107
    out = {r["bucket_start"]: r for r in qt.window_quantiles(make_points(rows), pw=3, pcts=(50,)).collect()}
    assert out[0]["p50"] == 3.0
    assert out[8]["p50"] == 103.0


def test_time_weighted_mean_holds_value(spark, make_points):
    from btrdb_spark.operators import resample as rs

    # one stream: value 10 held for 3/4 of the bucket, 20 for 1/4
    # bucket width 2^4=16: points at t=0 (v=10) and t=12 (v=20), range [0,16)
    rows = [("a", 0, 10.0, 10), ("a", 12, 20.0, 10)]
    out = rs.time_weighted_mean(make_points(rows), 0, 16, pw=4).collect()
    assert len(out) == 1
    r = out[0]
    assert r["held_ns"] == 16
    assert r["vtwmean"] == (10.0 * 12 + 20.0 * 4) / 16


def test_time_weighted_mean_splits_at_bucket_edges(spark, make_points):
    from btrdb_spark.operators import resample as rs

    # value 5 held from t=8 across buckets [0,16) and [16,32)
    rows = [("a", 8, 5.0, 10)]
    out = {r["bucket_start"]: r for r in rs.time_weighted_mean(make_points(rows), 0, 32, pw=4).collect()}
    assert out[0]["held_ns"] == 8 and out[0]["vtwmean"] == 5.0
    assert out[16]["held_ns"] == 16 and out[16]["vtwmean"] == 5.0


def test_time_weighted_mean_locf_from_before_range(spark, make_points):
    from btrdb_spark.operators import resample as rs

    # the point BEFORE the range holds into it
    rows = [("a", -100, 7.0, 10)]
    out = rs.time_weighted_mean(make_points(rows), 0, 16, pw=4).collect()
    assert len(out) == 1 and out[0]["vtwmean"] == 7.0 and out[0]["held_ns"] == 16


def test_time_weighted_mean_duplicate_timestamps(spark, make_points):
    from btrdb_spark.operators import resample as rs

    # duplicate t=0: (time, value) order -> larger value wins the hold
    rows = [("a", 0, 3.0, 10), ("a", 0, 9.0, 10)]
    out = rs.time_weighted_mean(make_points(rows), 0, 16, pw=4).collect()
    assert len(out) == 1 and out[0]["vtwmean"] == 9.0
