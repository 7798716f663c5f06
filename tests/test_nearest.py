"""Nearest-point truth table incl. inclusive/exclusive edges — mirrors
the reference's TestQT2_Nearest (qtree2_test.go:231-274; semantics
qtree.go:24-26)."""

from __future__ import annotations

import pytest

from btrdb_spark.operators.raw import nearest_all


@pytest.fixture(scope="module")
def pts(make_points):
    return make_points([("s", 10, 1.0, 10), ("s", 20, 2.0, 10), ("t", 15, 5.0, 10)])


def rows_of(df):
    return {(r["uuid"]): (r["time"], r["value"]) for r in df.collect()}


def test_backward_exclusive(pts):
    # backward from t=20: strictly before -> t=10 for s, t=15 for t
    got = rows_of(nearest_all(pts, 20, backward=True))
    assert got == {"s": (10, 1.0), "t": (15, 5.0)}


def test_forward_inclusive(pts):
    # forward from t=20: t >= 20 -> s hits 20 exactly; t has nothing
    got = rows_of(nearest_all(pts, 20, backward=False))
    assert got == {"s": (20, 2.0)}


def test_backward_at_first_point_empty(pts):
    got = rows_of(nearest_all(pts, 10, backward=True))
    assert got == {}


def test_forward_after_last_empty(pts):
    got = rows_of(nearest_all(pts, 21, backward=False))
    assert got == {}


def test_version_pinning(make_points):
    pts = make_points([("s", 10, 1.0, 10), ("s", 12, 2.0, 11)])
    got = rows_of(nearest_all(pts, 100, backward=True, version=10))
    assert got == {"s": (10, 1.0)}
