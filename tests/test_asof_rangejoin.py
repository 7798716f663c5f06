"""As-of join (batched Nearest, J3) and range join edge semantics."""

from __future__ import annotations

from btrdb_spark.operators.asof import asof_join
from btrdb_spark.operators.rangejoin import range_join, range_join_agg


def _probes(spark, rows):
    return spark.createDataFrame(
        [(str(u), int(t)) for (u, t) in rows], "uuid string, t long"
    )


def test_asof_backward_strict_excludes_equal_time(spark, make_points):
    pts = make_points([("1", 100, 1.0, 10), ("1", 200, 2.0, 10), ("1", 300, 3.0, 10)])
    out = {
        r["t"]: (r["asof_time"], r["asof_value"])
        for r in asof_join(pts, _probes(spark, [("1", 200), ("1", 250), ("1", 50)])).collect()
    }
    assert out[200] == (100, 1.0)  # strict: the point AT 200 is excluded
    assert out[250] == (200, 2.0)
    assert out[50] == (None, None)  # nothing before the first point


def test_asof_forward_inclusive(spark, make_points):
    pts = make_points([("1", 100, 1.0, 10), ("1", 200, 2.0, 10)])
    out = {
        r["t"]: (r["asof_time"], r["asof_value"])
        for r in asof_join(
            pts, _probes(spark, [("1", 200), ("1", 150), ("1", 201)]), forward=True
        ).collect()
    }
    assert out[200] == (200, 2.0)  # inclusive: point AT t wins
    assert out[150] == (200, 2.0)
    assert out[201] == (None, None)


def test_asof_duplicate_time_tie_takes_max_value(spark, make_points):
    pts = make_points([("1", 100, 5.0, 10), ("1", 100, 9.0, 10), ("1", 100, 7.0, 10)])
    back = asof_join(pts, _probes(spark, [("1", 101)])).collect()[0]
    fwd = asof_join(pts, _probes(spark, [("1", 100)]), forward=True).collect()[0]
    assert (back["asof_time"], back["asof_value"]) == (100, 9.0)
    assert (fwd["asof_time"], fwd["asof_value"]) == (100, 9.0)


def test_asof_is_per_stream(spark, make_points):
    pts = make_points([("1", 100, 1.0, 10), ("2", 150, 2.0, 10)])
    out = {
        r["uuid"]: r["asof_value"]
        for r in asof_join(pts, _probes(spark, [("1", 200), ("2", 200)])).collect()
    }
    assert out == {"1": 1.0, "2": 2.0}


def _ranges(spark, rows):
    return spark.createDataFrame(
        [(int(i), int(s), int(e)) for (i, s, e) in rows],
        "range_id long, start long, end long",
    )


def test_range_join_half_open_and_overlap(spark, make_points):
    pts = make_points(
        [("1", 10, 1.0, 10), ("1", 20, 2.0, 10), ("1", 30, 3.0, 10), ("1", 40, 4.0, 10)]
    )
    # overlapping ranges; [start, end) half-open; pw=3 -> 8-tick buckets
    rj = range_join(pts, _ranges(spark, [(0, 10, 30), (1, 20, 41)]), pw=3).collect()
    got = {(r["range_id"], r["time"]) for r in rj}
    assert got == {(0, 10), (0, 20), (1, 20), (1, 30), (1, 40)}  # 30 not in [10,30)


def test_range_join_agg_stats(spark, make_points):
    pts = make_points([("1", 10, 1.0, 10), ("1", 20, 3.0, 10), ("2", 15, 10.0, 10)])
    rows = range_join_agg(pts, _ranges(spark, [(0, 0, 100)]), pw=4).collect()
    by_uuid = {r["uuid"]: r for r in rows}
    assert by_uuid["1"]["cnt"] == 2 and by_uuid["1"]["vmean"] == 2.0
    assert by_uuid["2"]["vmin"] == by_uuid["2"]["vmax"] == 10.0


def test_asof_inclusive_backward_locf_rule(spark, make_points):
    pts = make_points([("1", 100, 1.0, 10), ("1", 200, 2.0, 10)])
    out = {
        r["t"]: (r["asof_time"], r["asof_value"])
        for r in asof_join(pts, _probes(spark, [("1", 200)]), strict=False).collect()
    }
    assert out[200] == (200, 2.0)  # inclusive: point AT t is its own sample


def test_resample_locf_grid(spark, make_points):
    from btrdb_spark.operators.resample import resample_locf

    pts = make_points([("1", 105, 1.0, 10), ("1", 225, 2.0, 10)])
    out = resample_locf(pts, pts.select("uuid").distinct(), 100, 500, 100).collect()
    got = {r["grid_time"]: (r["last_time"], r["value"]) for r in out}
    assert got[100] == (None, None)  # before first point: no invented data
    assert got[200] == (105, 1.0)
    assert got[300] == (225, 2.0)
    assert got[400] == (225, 2.0)  # carried forward
    assert len(got) == 4


def test_stream_rate(spark, make_points):
    from btrdb_spark.operators.resample import stream_rate

    ns = 1_000_000_000
    pts = make_points(
        [("1", 0, 0.0, 10), ("1", 2 * ns, 4.0, 10), ("1", 2 * ns, 4.0, 10), ("1", 3 * ns, 1.0, 10)]
    )
    rows = stream_rate(pts).collect()
    rates = [(r["time"], r["rate_per_sec"]) for r in rows]
    # dup timestamp pair (dt=0) dropped; 0->2s: 4/2=2.0; 2->3s: -3/1
    assert rates == [(2 * ns, 2.0), (3 * ns, -3.0)]


def test_asof_chunked_matches_single_window(spark, make_points):
    # randomized: duplicates, negative times, probe-only chunks, several
    # uuids — the chunked two-pass plan must be bit-identical to the
    # single-window plan for every (direction, strictness, chunk_width)
    import random

    rng = random.Random(7)
    pts_rows = []
    for u in ("a", "b", "c"):
        for _ in range(200):
            t = rng.randrange(-1000, 1000)
            pts_rows.append((u, t, float(rng.randrange(0, 50)), 10))
        # duplicate timestamps with distinct values
        pts_rows += [(u, 0, 1.0, 10), (u, 0, 9.0, 10), (u, 0, 4.0, 10)]
    pts = make_points(pts_rows)
    probe_rows = [(u, rng.randrange(-1500, 1500)) for u in ("a", "b", "c") for _ in range(150)]
    probe_rows += [("a", 0), ("b", 0), ("c", 1400)]  # equal-time + far-future probes
    probes = _probes(spark, probe_rows)

    for forward in (False, True):
        for strict in (None, False, True):
            base = asof_join(pts, probes, forward=forward, strict=strict).collect()
            for cw in (64, 257, 5000):  # power-of-2, prime, one-chunk-covers-all
                chunked = asof_join(
                    pts, probes, forward=forward, strict=strict, chunk_width=cw
                ).collect()
                assert chunked == base, (forward, strict, cw)


def test_asof_tolerance_nulls_stale_matches(spark, make_points):
    from btrdb_spark.operators.asof import asof_join_tolerance

    pts = make_points([("a", 100, 1.0, 10), ("a", 1000, 2.0, 10)])
    probes = spark.createDataFrame([("a", 150), ("a", 5000)], "uuid string, t long")
    out = {r["t"]: (r["asof_time"], r["asof_value"])
           for r in asof_join_tolerance(pts, probes, tolerance=100).collect()}
    assert out[150] == (100, 1.0)          # 50ns stale, within tolerance
    assert out[5000] == (None, None)       # 4000ns stale -> nulled


def test_cohort_retention_matrix(spark):
    from btrdb_spark.functions.events import cohort_retention

    W = 100
    rows = [
        (1, 0), (1, 10), (1, 150),    # cohort 0, active weeks 0 and 1
        (2, 50),                       # cohort 0, week 0 only
        (3, 250), (3, 450),            # cohort 2, offsets 0 and 2
    ]
    ev = spark.createDataFrame(rows, "user_id long, time_ns long")
    out = {(r["cohort_week"], r["week_offset"]): r["n_users"]
           for r in cohort_retention(ev, epoch=0, week=W).collect()}
    assert out[(0, 0)] == 2 and out[(0, 1)] == 1
    assert out[(2, 0)] == 1 and out[(2, 2)] == 1
    assert (0, 2) not in out
