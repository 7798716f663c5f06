"""Batched delete_ranges (verdict r7 ask #2): one tombstone append + one
ladder snapshot job per level for a whole (uuid, range) batch, with each
stream keeping its OWN new version (quasar.go:481-514 semantics)."""

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
        r["bucket_start"]: (r["cnt"], r["vmin"], r["vmean"], r["vmax"])
        for r in df.collect()
    }


def _raw_answer(engine, u, pw):
    pts, dels = engine._queryable(None, u)
    return aligned_windows(pts, u, -(1 << 45), 1 << 61, pw, deletes=dels)


def _seed(engine, names):
    out = {}
    for name in names:
        u = engine.create_stream(f"batch/{name}")
        pts = [(i * (1 << 18), float((i * 7) % 97)) for i in range(2000)]
        engine.insert(u, pts, sync=True)
        out[name] = u
    return out


def test_batch_versions_are_per_stream(engine):
    us = _seed(engine, ["a", "b", "c"])
    # give stream b an extra committed version so majors diverge
    engine.insert(us["b"], [((1 << 40), 5.0)], sync=True)
    before = {n: engine.stream_version(u)[0] for n, u in us.items()}
    vers = engine.delete_ranges(
        [
            (us["a"], 1 << 24, 1 << 27),
            (us["b"], 1 << 23, 1 << 26),
            (us["c"], 1 << 25, 1 << 28),
        ]
    )
    for n, u in us.items():
        assert vers[u] == before[n] + 1
        assert engine.stream_version(u)[0] == vers[u]


def test_batch_matches_sequential_single_deletes(spark, tmp_path):
    """The batch commit and N sequential delete_range calls must produce
    identical post-delete reads (raw and ladder) for every stream."""
    e1 = BTrDBEngine(spark, str(tmp_path / "seq"), flush_threshold=10**9, ladder=True)
    e2 = BTrDBEngine(spark, str(tmp_path / "bat"), flush_threshold=10**9, ladder=True)
    us1, us2 = _seed(e1, ["a", "b"]), _seed(e2, ["a", "b"])
    cuts = {"a": (1 << 24, 1 << 27), "b": (1 << 23, 1 << 26)}
    for n, (s, e) in cuts.items():
        e1.delete_range(us1[n], s, e)
    e2.delete_ranges([(us2[n], s, e) for n, (s, e) in cuts.items()])
    for n in cuts:
        raw1 = sorted(
            (r["time"], r["value"])
            for r in e1.raw_values(us1[n], -(1 << 45), 1 << 61).collect()
        )
        raw2 = sorted(
            (r["time"], r["value"])
            for r in e2.raw_values(us2[n], -(1 << 45), 1 << 61).collect()
        )
        assert raw1 == raw2 and raw1
        lad1 = e1.aligned_windows(us1[n], -(1 << 45), 1 << 61, pw=26)
        lad2 = e2.aligned_windows(us2[n], -(1 << 45), 1 << 61, pw=26)
        assert "vsum" in lad2._jdf.queryExecution().executedPlan().toString()
        assert _key(lad1) == _key(lad2) == _key(_raw_answer(e2, us2[n], 26))


def test_batch_multiple_ranges_one_stream_single_version(engine):
    us = _seed(engine, ["m"])
    u = us["m"]
    v0 = engine.stream_version(u)[0]
    # two disjoint ranges plus one overlapping the first — all commit at
    # ONE new version for the stream
    vers = engine.delete_ranges(
        [(u, 1 << 22, 1 << 24), (u, 1 << 26, 1 << 27), (u, (1 << 23), 1 << 25)]
    )
    assert vers == {u: v0 + 1}
    got = engine.aligned_windows(u, -(1 << 45), 1 << 61, pw=26)
    assert _key(got) == _key(_raw_answer(engine, u, 26))
    # at-version read BEFORE the batch still sees everything
    pre = engine.aligned_windows(u, -(1 << 45), 1 << 61, pw=26, version=v0)
    assert sum(c for c, *_ in _key(pre).values()) == 2000


def test_batch_flushes_buffered_streams(engine):
    us = _seed(engine, ["f"])
    u = us["f"]
    engine.insert(u, [((1 << 24) + 3, 123.0)])  # buffered, in delete range
    assert engine.stream_version(u)[1] == 1
    engine.delete_ranges([(u, 1 << 24, 1 << 25)])
    vals = [r["value"] for r in engine.raw_values(u, -(1 << 45), 1 << 61).collect()]
    assert 123.0 not in vals
    assert engine.stream_version(u)[1] == 0


def test_batch_unknown_stream_rejected_atomically(engine):
    us = _seed(engine, ["x"])
    u = us["x"]
    v0 = engine.stream_version(u)[0]
    with pytest.raises(KeyError):
        engine.delete_ranges([(u, 0, 1 << 20), ("nope", 0, 1 << 20)])
    # nothing committed for the valid stream either
    assert engine.stream_version(u)[0] == v0


def test_batch_bad_range_rejected(engine):
    us = _seed(engine, ["y"])
    with pytest.raises(ValueError):
        engine.delete_ranges([(us["y"], 10, 10)])
    assert engine.delete_ranges([]) == {}


def test_crash_between_tombstones_and_ladder_falls_back_exactly(
    spark, tmp_path, monkeypatch
):
    """Crash window: tombstone batch committed, ladder snapshots never
    written. The ladder gate must detect the uncovered delete versions
    and fall back to the exact raw path instead of serving stale
    pre-delete rollups (the batch analog of ADVICE r5 #4)."""
    from btrdb_spark.plans import rollup as ru

    eng = BTrDBEngine(spark, str(tmp_path / "cr"), flush_threshold=10**9, ladder=True)
    us = _seed(eng, ["c1", "c2"])

    def boom(*a, **k):
        raise RuntimeError("simulated crash before ladder rebase")

    monkeypatch.setattr(ru, "invalidate_buckets_multi", boom)
    with pytest.raises(RuntimeError):
        eng.delete_ranges(
            [(us["c1"], 1 << 24, 1 << 27), (us["c2"], 1 << 23, 1 << 26)]
        )
    monkeypatch.undo()
    # tombstones are committed (versions bumped) ...
    for u in us.values():
        assert eng.stream_version(u)[0] == 11
    # ... and every read is still exact: raw fallback, no stale rollup
    for u in us.values():
        got = eng.aligned_windows(u, -(1 << 45), 1 << 61, pw=26)
        assert _key(got) == _key(_raw_answer(eng, u, 26))
        # the post-delete rows really are gone
        n = sum(c for c, *_ in _key(got).values())
        assert n < 2000


@pytest.mark.parametrize("seed", [11, 23])
def test_randomized_batch_equals_sequential(spark, tmp_path, seed):
    """Randomized equivalence: for arbitrary (uuid, range) batches —
    overlapping, nested, duplicated-stream, arbitrary order — the batch
    commit and the same deletes applied sequentially produce identical
    raw AND ladder reads for every stream."""
    import random

    rng = random.Random(seed)
    e1 = BTrDBEngine(spark, str(tmp_path / f"s{seed}"), flush_threshold=10**9, ladder=True)
    e2 = BTrDBEngine(spark, str(tmp_path / f"b{seed}"), flush_threshold=10**9, ladder=True)
    names = ["r1", "r2", "r3"]
    us1, us2 = _seed(e1, names), _seed(e2, names)
    span = 2000 * (1 << 18)
    ranges = []
    for n in names:
        for _ in range(rng.randint(1, 3)):
            s = rng.randrange(0, span)
            e = min(s + rng.randrange(1, span // 2), span + 1)
            ranges.append((n, s, e))
    rng.shuffle(ranges)
    for n, s, e in ranges:  # sequential engine: one commit per range
        e1.delete_range(us1[n], s, e)
    e2.delete_ranges([(us2[n], s, e) for n, s, e in ranges])
    for n in names:
        raw1 = sorted(
            (r["time"], r["value"])
            for r in e1.raw_values(us1[n], -(1 << 45), 1 << 61).collect()
        )
        raw2 = sorted(
            (r["time"], r["value"])
            for r in e2.raw_values(us2[n], -(1 << 45), 1 << 61).collect()
        )
        assert raw1 == raw2
        assert _key(
            e1.aligned_windows(us1[n], -(1 << 45), 1 << 61, pw=26)
        ) == _key(e2.aligned_windows(us2[n], -(1 << 45), 1 << 61, pw=26))
