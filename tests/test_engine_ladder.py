"""Ladder-enabled engine: stat queries route through the rollup and must
equal the raw path exactly through insert/flush/delete lifecycles."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from btrdb_spark.engine import BTrDBEngine
from btrdb_spark.operators.windows import aligned_windows


@pytest.fixture()
def engine(spark, tmp_path):
    return BTrDBEngine(spark, str(tmp_path / "db"), flush_threshold=10**9, ladder=True)


def _key(df):
    return {
        r["bucket_start"]: (r["cnt"], r["vmin"], r["vmean"], r["vmax"]) for r in df.collect()
    }


def _raw_answer(engine, u, pw):
    pts, dels = engine._queryable(None, u)
    return aligned_windows(pts, u, -(1 << 45), 1 << 61, pw, deletes=dels)


def test_route_and_match_after_flush(engine):
    u = engine.create_stream("lad/a")
    pts = [(i * (1 << 18), float(i % 97)) for i in range(5000)]
    engine.insert(u, pts[:2500], sync=True)
    engine.insert(u, pts[2500:], sync=True)
    got = engine.aligned_windows(u, -(1 << 45), 1 << 61, pw=26)
    # routed plan reads the rollup table, not the points table
    assert "vsum" in got._jdf.queryExecution().executedPlan().toString()
    assert _key(got) == _key(_raw_answer(engine, u, 26))


def test_hot_merge_when_buffered(engine):
    """A5/A6: a stream with unflushed rows is STILL ladder-served — the
    committed interior comes from rollup partials, the buffer as an
    O(buffer) overlay partial, combined count-weighted (merger.go:126-208).
    The plan must not rescan the cold points table."""
    u = engine.create_stream("lad/b")
    engine.insert(u, [(1 << 20, 1.0)], sync=True)
    engine.insert(u, [(1 << 21, 2.0)])  # buffered, ladder not updated
    got = engine.aligned_windows(u, 0, 1 << 30, pw=22)
    assert "vsum" in got._jdf.queryExecution().toString()  # ladder partials feed the combine
    files = got.inputFiles()
    assert not any("points.g" in f for f in files)  # no cold rescan
    assert _key(got) == _key(_raw_answer(engine, u, 22))


def test_hot_merge_large_buffer_exact(engine):
    """30k buffered rows (just under the default threshold): the merged
    ladder+overlay answer is value-identical to the raw-path answer, and
    the plan reads the hot table but never the cold points table."""
    u = engine.create_stream("lad/hm")
    committed = [(i * (1 << 18), float(i % 89)) for i in range(4000)]
    engine.insert(u, committed[:2000], sync=True)
    engine.insert(u, committed[2000:], sync=True)
    # buffer 30k rows overlapping AND extending the committed range,
    # including duplicate timestamps (merge must be additive, not replace)
    buffered = [(i * (1 << 16) + 7, float((i * 13) % 101)) for i in range(30000)]
    for lo in range(0, 30000, 10000):
        engine.insert(u, buffered[lo:lo + 10000])
    got = engine.aligned_windows(u, -(1 << 45), 1 << 61, pw=26)
    assert "vsum" in got._jdf.queryExecution().toString()
    files = got.inputFiles()
    assert not any("points.g" in f for f in files), "hot-merge must not rescan cold points"
    assert any("/hot.g" in f for f in files), "overlay must come from the hot table"
    assert any("/agg_" in f for f in files), "interior must come from the ladder"
    assert _key(got) == _key(_raw_answer(engine, u, 26))


def test_fallback_below_ladder(engine):
    u = engine.create_stream("lad/c")
    engine.insert(u, [(1 << 20, 1.0), ((1 << 20) + 5, 3.0)], sync=True)
    got = engine.aligned_windows(u, 0, 1 << 30, pw=10)  # finer than level 20
    assert "vsum" not in got._jdf.queryExecution().executedPlan().toString()
    assert _key(got) == _key(_raw_answer(engine, u, 10))


def test_match_after_delete_invalidation(engine):
    u = engine.create_stream("lad/d")
    pts = [(i * (1 << 18), float(i)) for i in range(2000)]
    engine.insert(u, pts, sync=True)
    engine.delete_range(u, 1 << 24, 1 << 27)
    got = engine.aligned_windows(u, -(1 << 45), 1 << 61, pw=26)
    assert "vsum" in got._jdf.queryExecution().executedPlan().toString()
    assert _key(got) == _key(_raw_answer(engine, u, 26))


def test_bulk_load_roundtrip(spark, make_points, tmp_path):
    """Backfill path: bulk_load lands in cold storage with the bucketed
    layout, ladder answers match the raw-path answers exactly."""
    from btrdb_spark.engine import BTrDBEngine
    from btrdb_spark.operators.windows import aligned_windows

    import random

    rng = random.Random(7)
    rows = []
    for u in ("x", "y", "z"):
        t = 0
        for _ in range(2000):
            t += rng.randint(1, 10**9)
            rows.append((u, t, rng.random() * 50, 10))
    pts = make_points(rows)
    eng = BTrDBEngine(spark, str(tmp_path / "bl"), ladder=True)
    eng.bulk_load(pts.select("uuid", "time", "value"))
    got = {(r["uuid"], r["time"]) for r in eng.points.select("uuid", "time").collect()}
    assert len(got) == len({(u, t) for (u, t, _, _) in rows})
    lad = eng.ladder.aligned_windows(None, 0, 1 << 44, 40)
    raw = aligned_windows(eng.points.drop("uuid_bucket"), None, 0, 1 << 44, 40)
    kl = {(r["uuid"], r["bucket_start"]): (r["cnt"], r["vmin"], r["vmean"], r["vmax"]) for r in lad.collect()}
    kr = {(r["uuid"], r["bucket_start"]): (r["cnt"], r["vmin"], r["vmean"], r["vmax"]) for r in raw.collect()}
    assert kl == kr


def test_ladder_serves_historical_versions(spark, tmp_path):
    """Version-stamped partials: aligned_windows at an old version routed
    through the ladder equals the raw at-version path; after a delete the
    rebase snapshots keep EVERY version ladder-served and exact."""
    from pyspark.sql import functions as F

    from btrdb_spark.engine import BTrDBEngine
    from btrdb_spark.operators.windows import aligned_windows as raw_aw

    eng = BTrDBEngine(spark, str(tmp_path / "vlad"), ladder=True)
    u = eng.create_stream("v/lad")
    for b in range(3):  # versions 10, 11, 12
        eng.insert(u, [(b * 10**7 + i * 10**4, float(b * 1000 + i)) for i in range(200)])
        eng.flush(u)
    assert eng.stream_version(u) == (12, 0)

    def key(df):
        return {
            (r["uuid"], r["bucket_start"]): (r["cnt"], r["vmin"], r["vmean"], r["vmax"])
            for r in df.collect()
        }

    for v in (10, 11, 12):
        got = eng.aligned_windows(u, 0, 1 << 32, pw=20, version=v)
        want = raw_aw(eng.points_pruned(u), u, 0, 1 << 32, pw=20, version=v)
        assert key(got) == key(want), f"version {v}"
        # the routed plan must come from the ladder: it reads rollup
        # columns (vsum), never the raw points schema
        assert "vsum" in got._jdf.queryExecution().toString()
    # after a delete, versioned reads STAY rollup-routed (VERDICT r4 #7):
    # the delete appends rebase snapshots at its version, pre-delete
    # partials survive, so every historical version is still exact AND
    # ladder-served
    dver = eng.delete_range(u, 0, 10**7)  # wipes batch 0 entirely
    for v in (10, 11, 12, dver):
        gotv = eng.aligned_windows(u, 0, 1 << 32, pw=20, version=v)
        wantv = raw_aw(
            eng.points_pruned(u), u, 0, 1 << 32, pw=20, version=v, deletes=eng.deletes
        )
        assert key(gotv) == key(wantv), f"post-delete version {v}"
        assert "vsum" in gotv._jdf.queryExecution().toString(), (
            f"version {v} must still read the ladder after a delete"
        )
    # latest still routed (invalidation refreshed the ladder)
    latest = eng.aligned_windows(u, 0, 1 << 32, pw=20)
    want_latest = raw_aw(
        eng.points_pruned(u), u, 0, 1 << 32, pw=20, deletes=eng.deletes
    )
    assert key(latest) == key(want_latest)
    assert "vsum" in latest._jdf.queryExecution().toString()


def test_engine_windows_routes_hybrid(spark, tmp_path):
    """engine.windows uses the ladder hybrid plan when eligible, exactly
    matching the raw path; depth routes the approximate variant."""
    from pyspark.sql import functions as F

    from btrdb_spark.engine import BTrDBEngine
    from btrdb_spark.operators.windows import windows as raw_win

    eng = BTrDBEngine(spark, str(tmp_path / "ewr"), ladder=True)
    u = eng.create_stream("w/route")
    eng.insert(u, [(i * 10**9 + (i % 7) * 1000, float(i)) for i in range(2000)])
    eng.flush(u)
    width = 63 * 10**9  # odd width
    got = eng.windows(u, 0, 1999 * 10**9, width)
    assert "vsum" in got._jdf.queryExecution().toString()  # ladder-fed plan
    want = raw_win(eng.points_pruned(u), u, 0, 1999 * 10**9, width)
    key = lambda df: {
        (r["uuid"], r["window_start"]): (r["cnt"], r["vmin"], r["vmean"], r["vmax"])
        for r in df.collect()
    }
    assert key(got) == key(want)
    # depth variant: whole-bucket attribution may over-count at the
    # unaligned rounded end by at most one bucket's points (the
    # reference's atomic-subtree semantics, qtree.go:1108-1142)
    approx = eng.windows(u, 0, 1999 * 10**9, width, depth=30)
    tot_a = sum(r["cnt"] for r in approx.collect())
    tot_e = sum(r["cnt"] for r in want.collect())
    assert tot_e <= tot_a <= tot_e + 2


def test_ladder_versions_after_partial_delete_and_reinsert(spark, tmp_path):
    """Rebase-snapshot invalidation, the hard cases: a delete covering
    PART of a bucket, then fresh inserts into the deleted range. Every
    version (pre-delete, at-delete, post-reinsert) must match the raw
    at-version path and keep reading the ladder."""
    from btrdb_spark.engine import BTrDBEngine
    from btrdb_spark.operators.windows import aligned_windows as raw_aw

    eng = BTrDBEngine(spark, str(tmp_path / "rbs"), ladder=True)
    u = eng.create_stream("rb/a")
    eng.insert(u, [(i * 10**4, float(i)) for i in range(500)])
    eng.flush(u)  # version 10
    # delete the middle of the range: cuts buckets mid-way at fine levels
    d1 = eng.delete_range(u, 123 * 10**4, 321 * 10**4)  # version 11
    # re-insert INTO the deleted range (visible again: version > delete)
    eng.insert(u, [(200 * 10**4 + i * 10**3, -float(i)) for i in range(50)])
    eng.flush(u)  # version 12
    d2 = eng.delete_range(u, 0, 50 * 10**4)  # second delete, version 13

    def key(df):
        return {
            (r["uuid"], r["bucket_start"]): (r["cnt"], r["vmin"], r["vmean"], r["vmax"])
            for r in df.collect()
        }

    for v in (10, d1, 12, d2, None):
        got = eng.aligned_windows(u, 0, 1 << 32, pw=20, version=v)
        want = raw_aw(
            eng.points_pruned(u), u, 0, 1 << 32, pw=20, version=v, deletes=eng.deletes
        )
        assert key(got) == key(want), f"version {v}"
        assert "vsum" in got._jdf.queryExecution().toString(), f"version {v} not ladder-served"
