"""Round-8 ADVICE regressions: theil-sen even pair counts (float-div
median filter dropped whole event_types), ns-exact day bucketing, and
session-window sub-second gaps."""

from __future__ import annotations

import pytest

from btrdb_spark.functions import analytics

DAY = analytics.DAY_NS


def _ev(spark, rows):
    full = [
        (r[0], r[1], r[2], float(r[3]), i) for i, r in enumerate(rows)
    ]
    return spark.createDataFrame(
        full,
        "user_id long, time_ns long, event_type string, value double, "
        "event_id long",
    )


def test_theil_sen_even_pair_count_not_dropped(spark):
    # n_days=4 -> C(4,2)=6 pairwise slopes (EVEN). With float division
    # in the median filter, (np+1)/2 = 3.5 matches no row_number and the
    # type silently vanishes; integer div picks the lower median (rn=3).
    rows = [(1, d * DAY + 5, "a", 3.0 * d) for d in range(4)]
    out = analytics.theil_sen_daily_slope(_ev(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_days"] == 4 and r["n_pairs"] == 6
    assert r["slope_per_day"] == 3.0


def test_theil_sen_lower_median_on_even_count(spark):
    # 4 days with means 0, 1, 3, 6 -> slopes {1, 1.5, 2, 2, 2.5, 3};
    # lower median (3rd of 6 sorted) = 2.0, NOT the averaged 2.0... use
    # asymmetric values: means 0, 1, 2, 10 -> slopes
    # {1, 1, 1, 8, 4.5, 8/3} sorted = {1, 1, 1, 8/3, 4.5, 8} -> rn3 = 1.
    rows = [
        (1, 0 * DAY + 5, "a", 0.0),
        (1, 1 * DAY + 5, "a", 1.0),
        (1, 2 * DAY + 5, "a", 2.0),
        (1, 3 * DAY + 5, "a", 10.0),
    ]
    out = analytics.theil_sen_daily_slope(_ev(spark, rows)).collect()
    assert out[0]["slope_per_day"] == 1.0


def test_day_bucket_integer_exact_near_midnight(spark):
    # Raw-ns timestamp 64 ns below a day boundary, beyond 2^53 so the
    # long->double conversion rounds UP across midnight under float
    # division. Integer div must keep it in the earlier day.
    boundary = 100_000 * DAY  # 8.64e18 ns > 2^53 (double ulp here ~1024)
    t = boundary - 64
    rows = [
        (1, t, "a", 10.0),
        (1, boundary + 5, "a", 50.0),
        # baseline day so seasonal has a "before last day" profile
        (1, boundary - DAY + 5, "a", 10.0),
    ]
    out = analytics.seasonal_profile_deviation(_ev(spark, rows)).collect()
    # hour 23 of the pre-boundary days holds t; the last day is the
    # boundary day. If t leaked into the boundary day, hour-0 last_mean
    # would average 10 and 50.
    last_day_rows = [r for r in out if r["hour"] == 0]
    assert last_day_rows and last_day_rows[0]["last_mean"] == 50.0


def test_session_window_subsecond_gap(spark):
    # 1.5 ms gap threshold: events 1 ms apart share a session, 2 ms
    # apart do not. Whole-second truncation would have made gap_s = 0
    # (or worse, sessionized everything together at 1 s granularity).
    G = 1_500_000  # 1.5 ms in ns
    rows = [
        (1, 0, "a", 1.0),
        (1, 1_000_000, "a", 2.0),   # 1 ms later -> same session
        (1, 4_000_000, "b", 3.0),   # 3 ms later -> new session
    ]
    out = analytics.session_window_stats(_ev(spark, rows), gap_ns=G).collect()
    assert len(out) == 2
    assert out[0]["n_events"] == 2 and out[1]["n_events"] == 1


def test_session_window_rejects_sub_us_gap(spark):
    with pytest.raises(ValueError):
        analytics.session_window_stats(_ev(spark, [(1, 0, "a", 1.0)]),
                                       gap_ns=1500)


def test_query_rpc_sfdir_allowlist(spark, tmp_path):
    from btrdb_spark.engine import BTrDBEngine
    from btrdb_spark.service import BTrDBService, RpcError

    root = tmp_path / "store"
    eng = BTrDBEngine(spark, str(root))
    ok_dir = tmp_path / "tables" / "sf0"
    ok_dir.mkdir(parents=True)
    sib = tmp_path / "tables" / "sf1"
    sib.mkdir()

    def q(spark, sf_dir):
        return spark.range(1).selectExpr("id")

    svc = BTrDBService(eng, queries={"one": q}, sf_dir=str(ok_dir))
    # default root + sibling scale dir pass; an outside path is refused
    meta, batches = svc.rpc_Query({"name": "one"})
    assert meta["columns"] == ["id"]
    meta, _ = svc.rpc_Query({"name": "one", "sfDir": str(sib)})
    assert meta["columns"] == ["id"]
    with pytest.raises(RpcError) as ei:
        svc.rpc_Query({"name": "one", "sfDir": "/etc"})
    assert ei.value.code == 403


def test_sketch_paths_gated_on_non_loopback(spark, tmp_path):
    """On a non-loopback binding, StartSketch's caller-supplied paths
    must resolve under an allowed root (it is otherwise an arbitrary
    read AND write primitive); loopback stays unrestricted."""
    from btrdb_spark.engine import BTrDBEngine
    from btrdb_spark.service import BTrDBService, RpcError

    eng = BTrDBEngine(spark, str(tmp_path / "store"))
    allowed = tmp_path / "allowed"
    allowed.mkdir()
    svc = BTrDBService(eng, host="0.0.0.0", sf_dir_allow=[str(allowed)])
    req = dict(
        kind="kmv", name="x", schema="g string, u long",
        groupCol="g", keyCol="u",
        path=str(allowed / "src") + "/*.parquet",
        checkpoint="/etc/evil_ckpt",
    )
    with pytest.raises(RpcError) as ei:
        svc.rpc_StartSketch(req)
    assert ei.value.code == 403
    req2 = dict(req, checkpoint=str(allowed / "ckpt"),
                path="/etc/*.parquet")
    with pytest.raises(RpcError) as ei2:
        svc.rpc_StartSketch(req2)
    assert ei2.value.code == 403
