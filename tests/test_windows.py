"""Aligned/arbitrary window semantics vs the reference contract:
snap rules (quasar.go:279-283), skip-empty (qtree.go:878), end rounding
(quasar.go:322-324), zero-count hole emission (qtree.go:1143-1173),
count-weighted mean exactness (merger.go:197)."""

from __future__ import annotations

import pytest

from btrdb_spark.operators.windows import aligned_windows, windows


@pytest.fixture(scope="module")
def pts(make_points):
    # stream "s": points at t=1,2,3 (bucket 0), t=9 (bucket 1), hole bucket 2,
    # t=25 (bucket 3) for width 8
    return make_points(
        [("s", 1, 1.0, 10), ("s", 2, 2.0, 10), ("s", 3, 6.0, 10), ("s", 9, 4.0, 11), ("s", 25, 8.0, 11)]
    )


def test_aligned_snap_and_skip_empty(pts):
    # start=1 snaps to 0; end=26 snaps to 24 -> range [0, 24): buckets 0,1,2
    # bucket 2 (16..24) is empty and must be SKIPPED; t=25 excluded by snap
    rows = aligned_windows(pts, "s", 1, 26, pw=3).collect()
    assert [(r["bucket_start"], r["cnt"], r["vmin"], r["vmean"], r["vmax"]) for r in rows] == [
        (0, 3, 1.0, 3.0, 6.0),
        (8, 1, 4.0, 4.0, 4.0),
    ]


def test_aligned_end_already_aligned(pts):
    # end=32 aligned: buckets 0..3 incl; bucket 3 has t=25
    rows = aligned_windows(pts, "s", 0, 32, pw=3).collect()
    assert [r["bucket_start"] for r in rows] == [0, 8, 24]


def test_windows_holes_and_rounding(pts):
    # width 8 from 0, end=30 -> rounded to 24 -> 3 windows; hole at widx 2
    # is NOT in range (rounded out); hole emission shows at widx 2 of [0,32)
    rows = windows(pts, "s", 0, 30, width=8).collect()
    assert [(r["window_start"], r["cnt"]) for r in rows] == [(0, 3), (8, 1), (16, 0)]
    hole = rows[2]
    assert hole["vmin"] is None and hole["vmean"] is None and hole["vmax"] is None


def test_windows_anchored_at_start(pts):
    # anchor start=1: windows [1,9) [9,17) [17,25); t=1..3 in w0, t=9 in w1,
    # t=25 excluded (rounding end=26 -> 25)
    rows = windows(pts, "s", 1, 26, width=8).collect()
    assert [(r["window_start"], r["cnt"]) for r in rows] == [(1, 3), (9, 1), (17, 0)]


def test_windows_version_pinned(pts):
    rows = windows(pts, "s", 0, 32, width=8, version=10).collect()
    # only version<=10 rows: t=1,2,3
    assert [(r["window_start"], r["cnt"]) for r in rows] == [(0, 3), (8, 0), (16, 0), (24, 0)]


def test_mean_is_exact(make_points):
    pts = make_points([("m", i, 0.1, 10) for i in range(10)])
    rows = aligned_windows(pts, "m", 0, 16, pw=4).collect()
    assert rows[0]["vmean"] == 0.1


def test_windows_empty_stream_emits_nothing(make_points):
    pts = make_points([("other", 5, 1.0, 10)])
    rows = windows(pts, "missing", 0, 32, width=8).collect()
    assert rows == []


def test_windows_sliding_overlap(spark):
    # points at t=0..9 on one stream; width=4, hop=2 over [0, 10)
    rows = [("s", t, float(t), 10) for t in range(10)]
    pts = spark.createDataFrame(rows, "uuid string, time long, value double, version long")
    from btrdb_spark.operators.windows import windows_sliding

    out = {r["window_start"]: r for r in
           windows_sliding(pts, None, 0, 10, width=4, hop=2).collect()}
    # anchors 0,2,4,6 (last window [6,10) fits); each holds 4 points
    assert sorted(out) == [0, 2, 4, 6]
    assert out[2]["cnt"] == 4 and out[2]["vmin"] == 2.0 and out[2]["vmax"] == 5.0
    assert out[2]["vmean"] == 3.5


def test_windows_sliding_early_points_clamped(spark):
    # a point before the first full window must not invent window -1
    pts = spark.createDataFrame(
        [("s", 0, 1.0, 10)], "uuid string, time long, value double, version long"
    )
    from btrdb_spark.operators.windows import windows_sliding

    out = windows_sliding(pts, None, 0, 100, width=10, hop=3).collect()
    assert min(r["window_start"] for r in out) == 0


def test_windows_sliding_width_lt_hop(spark):
    # width < hop: points in the gap between windows cover NO window.
    # With width=4, hop=3 over [0, 11): anchors k=0..2 at 0,3,6 covering
    # [0,4) [3,7) [6,10). t=10 covers nothing (k_min=3 > k_max=2) and must
    # not be exploded into a descending bogus sequence.
    rows = [("s", t, float(t), 10) for t in range(11)]
    pts = spark.createDataFrame(rows, "uuid string, time long, value double, version long")
    from btrdb_spark.operators.windows import windows_sliding

    out = {r["window_start"]: r for r in
           windows_sliding(pts, None, 0, 11, width=4, hop=3).collect()}
    assert sorted(out) == [0, 3, 6]
    assert out[0]["cnt"] == 4 and out[0]["vmin"] == 0.0 and out[0]["vmax"] == 3.0
    assert out[3]["cnt"] == 4 and out[3]["vmax"] == 6.0
    assert out[6]["cnt"] == 4 and out[6]["vmax"] == 9.0


def test_windows_sliding_gap_points_dropped(spark):
    # width=2, hop=5 over [0, 12): anchors 0,5,10 -> windows [0,2) [5,7) [10,12).
    # Points at t=3,4,8 are in coverage gaps and must contribute to nothing.
    rows = [("s", t, float(t), 10) for t in range(12)]
    pts = spark.createDataFrame(rows, "uuid string, time long, value double, version long")
    from btrdb_spark.operators.windows import windows_sliding

    out = {r["window_start"]: r for r in
           windows_sliding(pts, None, 0, 12, width=2, hop=5).collect()}
    assert sorted(out) == [0, 5, 10]
    assert all(out[a]["cnt"] == 2 for a in (0, 5, 10))
    assert out[5]["vmin"] == 5.0 and out[5]["vmax"] == 6.0


def test_windows_sliding_unaligned_range_tail(spark):
    # Unaligned range: (end-start-width) % hop != 0. width=6, hop=4 over
    # [0, 17): last_anchor = (17-6)//4 = 2 -> anchors 0,4,8 covering up to
    # t<14. Points at t=14..16 have k_min = ceil((t-5)/4) = 3 > last_anchor
    # and must be dropped, not exploded into descending sequences.
    rows = [("s", t, 1.0, 10) for t in range(17)]
    pts = spark.createDataFrame(rows, "uuid string, time long, value double, version long")
    from btrdb_spark.operators.windows import windows_sliding

    out = {r["window_start"]: r["cnt"] for r in
           windows_sliding(pts, None, 0, 17, width=6, hop=4).collect()}
    assert sorted(out) == [0, 4, 8]
    assert out[0] == 6 and out[4] == 6 and out[8] == 6


def test_find_gaps(spark):
    rows = [("s", 0, 1.0, 10), ("s", 5, 1.0, 10), ("s", 100, 1.0, 10), ("s", 103, 1.0, 10)]
    pts = spark.createDataFrame(rows, "uuid string, time long, value double, version long")
    from btrdb_spark.operators.resample import find_gaps

    out = [(r["gap_start"], r["gap_end"], r["gap_ns"]) for r in find_gaps(pts, 10).collect()]
    assert out == [(5, 100, 95)]


def test_value_histogram_clamping(spark):
    from btrdb_spark.operators.quantiles import value_histogram

    rows = [("s", i, v, 10) for i, v in enumerate([-5.0, 0.0, 4.9, 5.0, 99.0, 200.0])]
    pts = spark.createDataFrame(rows, "uuid string, time long, value double, version long")
    out = {r["bin"]: r for r in value_histogram(pts, lo=0.0, hi=100.0, n_bins=20).collect()}
    assert out[0]["cnt"] == 3          # -5 clamps in, 0.0 and 4.9 belong
    assert out[1]["cnt"] == 1          # 5.0 starts bin 1
    assert out[19]["cnt"] == 2         # 99 belongs, 200 clamps in
    assert out[1]["bin_start"] == 5.0 and out[1]["bin_end"] == 10.0
