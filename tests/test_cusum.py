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


def test_holt_converges_on_linear_trend(spark):
    from btrdb_spark.operators import resample as rs

    # perfectly linear bucket means: x_b = b (one point per 2^4 bucket)
    rows = [("a", b * 16, float(b), 10) for b in range(60)]
    pts = spark.createDataFrame(
        rows, "uuid string, time long, value double, version long"
    )
    out = rs.holt_forecast(pts, alpha=0.5, beta=0.25, horizon_buckets=2, pw=4).collect()
    assert len(out) == 1
    r = out[0]
    # on a pure linear series Holt converges to trend ~= slope (1/bucket)
    assert abs(r["trend"] - 1.0) < 0.05
    assert abs(r["level"] - 59.0) < 0.5
    assert abs(r["forecast_2"] - (r["level"] + 2 * r["trend"])) < 1e-12


def test_holt_flat_series_zero_trend(spark):
    from btrdb_spark.operators import resample as rs

    rows = [("a", b * 16, 7.0, 10) for b in range(40)]
    pts = spark.createDataFrame(
        rows, "uuid string, time long, value double, version long"
    )
    r = rs.holt_forecast(pts, pw=4).collect()[0]
    assert r["trend"] == 0.0 and r["level"] == 7.0 and r["forecast_3"] == 7.0


def test_seasonal_anomaly_flags_hourly_outlier(spark):
    from btrdb_spark.operators.quantiles import seasonal_anomaly

    ns_h = 3_600_000_000_000
    # hour-0 baseline ~10 with small jitter across 12 days, one big spike
    rows = [("a", d * 24 * ns_h + (d % 3), 10.0 + (d % 3) * 0.1, 10) for d in range(12)]
    rows.append(("a", 12 * 24 * ns_h, 50.0, 10))
    pts = spark.createDataFrame(
        rows, "uuid string, time long, value double, version long"
    )
    out = seasonal_anomaly(pts, z_threshold=3.0, min_bucket=10).collect()
    assert len(out) == 1 and out[0]["value"] == 50.0 and out[0]["hour"] == 0


def test_sax_motif_finds_repeating_shape(spark):
    from btrdb_spark.operators import compress as cp

    # one point per 2^4 bucket, repeating pattern low,low,high,high ->
    # the period-4 word repeats; z-normalized symbols must cycle
    pattern = [0.0, 0.0, 10.0, 10.0]
    rows = [("a", b * 16, pattern[b % 4], 10) for b in range(40)]
    pts = spark.createDataFrame(
        rows, "uuid string, time long, value double, version long"
    )
    out = cp.sax_motifs(pts, pw=4, word_len=4, k=2).collect()
    assert out[0]["uuid"] == "a"
    # 4 rotations of the same cycle dominate; top word occurs ~n/4 times
    assert out[0]["n_occurrences"] >= 9
    # symbols only use the outer letters for a two-level series
    assert set(out[0]["word"]) <= {"a", "d"}


def test_sax_constant_stream_emits_nothing(spark):
    from btrdb_spark.operators import compress as cp

    rows = [("c", b * 16, 5.0, 10) for b in range(20)]
    pts = spark.createDataFrame(
        rows, "uuid string, time long, value double, version long"
    )
    assert cp.sax_motifs(pts, pw=4).collect() == []  # sd undefined -> no symbols


def test_holt_zero_horizon_degrades_to_level_trend(spark):
    """horizon_buckets=0 must return level/trend only, not die on a
    malformed trailing-comma schema (ADVICE r3)."""
    pts = spark.createDataFrame(
        [("u", i * 16, float(i)) for i in range(8)],
        "uuid string, time long, value double",
    )
    out = rs.holt_forecast(pts, alpha=0.5, beta=0.25, horizon_buckets=0, pw=4)
    assert out.columns == ["uuid", "n_buckets", "level", "trend"]
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["n_buckets"] == 8
    try:
        rs.holt_forecast(pts, horizon_buckets=-1, pw=4)
        assert False, "expected ValueError"
    except ValueError:
        pass
