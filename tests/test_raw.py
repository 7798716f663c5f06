"""Raw scan bounds, versioning, and delete-tombstone semantics
(qtree.go:755 end-exclusive; quasar.go:481-514 COW deletes)."""

from __future__ import annotations

import pytest

from btrdb_spark.operators.raw import apply_deletes, at_version, raw_values


@pytest.fixture(scope="module")
def pts(make_points):
    return make_points(
        [("s", 0, 0.0, 10), ("s", 5, 1.0, 10), ("s", 9, 2.0, 11), ("s", 10, 3.0, 11), ("s", 11, 4.0, 12)]
    )


def test_bounds_inclusive_exclusive(pts):
    rows = raw_values(pts, "s", 5, 10)
    assert [(r["time"], r["value"]) for r in rows.collect()] == [(5, 1.0), (9, 2.0)]


def test_query_at_version(pts):
    rows = raw_values(pts, "s", 0, 100, version=10).collect()
    assert [r["time"] for r in rows] == [0, 5]
    rows = raw_values(pts, "s", 0, 100, version=11).collect()
    assert [r["time"] for r in rows] == [0, 5, 9, 10]


def test_delete_hides_then_reinsert_visible(make_points, make_deletes):
    # insert v10, delete [0,10) at v11, re-insert t=5 at v12
    pts = make_points([("s", 5, 1.0, 10), ("s", 15, 2.0, 10), ("s", 5, 9.0, 12)])
    dels = make_deletes([("s", 0, 10, 11)])
    # at v10: delete not yet visible
    rows = raw_values(pts, "s", 0, 100, version=10, deletes=dels).collect()
    assert [(r["time"], r["value"]) for r in rows] == [(5, 1.0), (15, 2.0)]
    # at v11: old t=5 hidden
    rows = raw_values(pts, "s", 0, 100, version=11, deletes=dels).collect()
    assert [(r["time"], r["value"]) for r in rows] == [(15, 2.0)]
    # at v12: re-inserted point visible, old one still hidden
    rows = raw_values(pts, "s", 0, 100, version=12, deletes=dels).collect()
    assert [(r["time"], r["value"]) for r in rows] == [(5, 9.0), (15, 2.0)]


def test_duplicate_timestamps_preserved(make_points):
    pts = make_points([("s", 7, float(i), 10) for i in range(5)])
    rows = raw_values(pts, "s", 0, 10).collect()
    assert len(rows) == 5 and all(r["time"] == 7 for r in rows)
