"""Changed-ranges: version-window selection, bucket snapping, island
coalescing (quasar.go:436-470, merger.go:10-124)."""

from __future__ import annotations

from btrdb_spark.operators.changes import changed_ranges


def test_coalesce_adjacent(make_points):
    # res=3 (width 8): changed points at t=1 (bucket 0-8) and t=9 (8-16)
    # are adjacent -> one range [0,16); t=100 separate
    pts = make_points(
        [("s", 1, 1.0, 11), ("s", 9, 1.0, 11), ("s", 100, 1.0, 11), ("s", 3, 1.0, 10)]
    )
    rows = changed_ranges(pts, "s", 10, 11, resolution=3).collect()
    assert [(r["range_start"], r["range_end"]) for r in rows] == [(0, 16), (96, 104)]


def test_version_window_bounds(make_points):
    pts = make_points([("s", 1, 1.0, 10), ("s", 9, 1.0, 11), ("s", 17, 1.0, 12)])
    # (10, 11] -> only version 11
    rows = changed_ranges(pts, "s", 10, 11, resolution=3).collect()
    assert [(r["range_start"], r["range_end"]) for r in rows] == [(8, 16)]


def test_deletes_contribute(make_points, make_deletes):
    pts = make_points([("s", 1, 1.0, 10)])
    dels = make_deletes([("s", 20, 33, 11)])
    rows = changed_ranges(pts, "s", 10, 11, resolution=3, deletes=dels).collect()
    # delete [20,33) snaps to [16, 40)
    assert [(r["range_start"], r["range_end"]) for r in rows] == [(16, 40)]


def test_wide_delete_contains_point_buckets(make_points, make_deletes):
    # delete [0, 80) fully contains the changed point buckets [16,24) and
    # [40,48): the island pass must track the RUNNING MAX end (lag(bend)
    # would split after the contained bucket) -> exactly one range [0, 80)
    pts = make_points([("s", 17, 1.0, 11), ("s", 41, 1.0, 11)])
    dels = make_deletes([("s", 0, 80, 11)])
    rows = changed_ranges(pts, "s", 10, 11, resolution=3, deletes=dels).collect()
    assert [(r["range_start"], r["range_end"]) for r in rows] == [(0, 80)]


def test_contained_bucket_then_gap(make_points, make_deletes):
    # containment followed by a genuine gap: [0,80) covers [16,24); the
    # next bucket [96,104) starts after the running max -> two ranges
    pts = make_points([("s", 17, 1.0, 11), ("s", 100, 1.0, 11)])
    dels = make_deletes([("s", 0, 80, 11)])
    rows = changed_ranges(pts, "s", 10, 11, resolution=3, deletes=dels).collect()
    assert [(r["range_start"], r["range_end"]) for r in rows] == [(0, 80), (96, 104)]


def test_negative_time_buckets(make_points):
    pts = make_points([("s", -1, 1.0, 11), ("s", -9, 1.0, 11)])
    rows = changed_ranges(pts, "s", 10, 11, resolution=3).collect()
    assert [(r["range_start"], r["range_end"]) for r in rows] == [(-16, 0)]
