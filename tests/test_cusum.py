"""Semantic tests for per-stream CUSUM changepoint alarms."""

from __future__ import annotations

from btrdb_spark.operators import resample as rs


def _pts(spark, rows):
    return spark.createDataFrame(
        [(u, int(t), float(v), 10) for (u, t, v) in rows],
        "uuid string, time long, value double, version long",
    )


def test_cusum_fires_on_level_shift(spark):
    # 20 points at 0, then 20 at 10: mean=5, k=2 -> pos drifts +3/step
    rows = [("a", t, 0.0) for t in range(20)] + [("a", 20 + t, 10.0) for t in range(20)]
    out = rs.cusum_alarms(_pts(spark, rows), k=2.0, h=9.0).collect()
    ups = [r for r in out if r["direction"] == "up"]
    downs = [r for r in out if r["direction"] == "down"]
    # the low segment drifts the DOWN statistic, the high segment the UP one
    assert ups and downs
    assert all(r["time"] >= 20 for r in ups)
    assert all(r["time"] < 20 for r in downs)
    assert all(r["stat"] > 9.0 for r in out)


def test_cusum_quiet_stream_no_alarms(spark):
    rows = [("a", t, 5.0 if t % 2 == 0 else 6.0) for t in range(50)]
    out = rs.cusum_alarms(_pts(spark, rows), k=2.0, h=9.0).collect()
    assert out == []


def test_cusum_resets_after_alarm(spark):
    # sustained shift: alarms recur with spacing ~= h / (shift - k)
    rows = [("a", t, 0.0) for t in range(10)] + [("a", 10 + t, 20.0) for t in range(30)]
    out = rs.cusum_alarms(_pts(spark, rows), k=2.0, h=25.0).collect()
    ups = sorted(r["time"] for r in out if r["direction"] == "up")
    assert len(ups) >= 3
    gaps = [b - a for a, b in zip(ups, ups[1:])]
    # post-reset re-accumulation takes multiple steps, so alarms are spaced
    assert all(g >= 2 for g in gaps)


def test_cusum_streams_independent(spark):
    rows = [("a", t, 0.0) for t in range(30)] + [("b", t, float(t % 2)) for t in range(30)]
    rows += [("a", 30 + t, 50.0) for t in range(5)]
    out = rs.cusum_alarms(_pts(spark, rows), k=2.0, h=20.0).collect()
    assert {r["uuid"] for r in out} == {"a"}
