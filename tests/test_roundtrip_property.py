"""Randomized round-trip tests mirroring the reference's GenData strategy
(qtree/qtree_test.go:87-114, qtree2_test.go:146-229): random-spacing data,
shuffled out-of-order multi-batch inserts across many commits, duplicate
timestamps — read back and compare EXACTLY against a pure-Python model.

Seeded (not time-seeded like the rotten reference tests) so failures
reproduce."""

from __future__ import annotations

import random

import pytest

from btrdb_spark.engine import BTrDBEngine


def gen_data(rng, n, avg_ns=3_600_000_000_000, spread=1_800_000_000_000, start=0):
    """GenData pattern: t += avg ± spread/2 (qtree_test.go:87-114)."""
    t = start
    out = []
    for _ in range(n):
        t += rng.randint(avg_ns - spread // 2, avg_ns + spread // 2)
        out.append((t, rng.random() * 100))
    return out


@pytest.fixture(scope="module")
def loaded(spark, tmp_path_factory):
    """One engine with a multi-batch out-of-order history + truth model."""
    rng = random.Random(42)
    eng = BTrDBEngine(spark, str(tmp_path_factory.mktemp("prop")), flush_threshold=10**9)
    data = gen_data(rng, 600)
    # duplicate-timestamp stress (qtree2_test.go:190-229)
    dup_t = data[100][0]
    data += [(dup_t, float(i)) for i in range(20)]
    # negative times (valid domain)
    data += [(-(1 << 40) + i * (1 << 30), rng.random()) for i in range(50)]
    shuffled = data[:]
    rng.shuffle(shuffled)
    u = eng.create_stream("prop/a")
    versions = []  # (version, set of rows committed at that version)
    i = 0
    while i < len(shuffled):
        k = rng.randint(30, 100)
        batch = shuffled[i : i + k]
        i += k
        maj, _ = eng.insert(u, batch, sync=True)
        versions.append((maj, batch))
    return eng, u, data, versions


def test_full_readback_exact(loaded):
    eng, u, data, _ = loaded
    got = [(r["time"], r["value"]) for r in eng.raw_values(u, -(1 << 45), 1 << 62).collect()]
    assert got == sorted(data)


def test_range_query_random_bounds(loaded):
    eng, u, data, _ = loaded
    rng = random.Random(7)
    times = sorted(t for t, _ in data)
    for _ in range(5):
        s = rng.choice(times)
        e = rng.choice(times)
        if s > e:
            s, e = e, s
        got = [(r["time"], r["value"]) for r in eng.raw_values(u, s, e).collect()]
        want = sorted((t, v) for (t, v) in data if s <= t < e)
        assert got == want


def test_query_at_every_version(loaded):
    eng, u, _, versions = loaded
    acc = []
    for maj, batch in versions[:6]:
        acc += batch
        got = [
            (r["time"], r["value"])
            for r in eng.raw_values(u, -(1 << 45), 1 << 62, version=maj).collect()
        ]
        assert got == sorted(acc)


def test_windows_match_python_model(loaded):
    eng, u, data, _ = loaded
    pw = 44  # ~4.9h buckets
    width = 1 << pw
    got = {
        r["bucket_start"]: (r["cnt"], r["vmin"], r["vmax"])
        for r in eng.aligned_windows(u, -(1 << 45), 1 << 62, pw).collect()
    }
    model: dict[int, list[float]] = {}
    for t, v in data:
        b = (t // width) * width
        model.setdefault(b, []).append(v)
    want = {b: (len(vs), min(vs), max(vs)) for b, vs in model.items()}
    assert got == want


def test_mean_matches_python_model_exactly(loaded):
    """vmean goes through DECIMAL(38,6) per-value quantization; mirror it."""
    from decimal import ROUND_HALF_UP, Decimal

    eng, u, data, _ = loaded
    pw = 50
    width = 1 << pw
    got = {r["bucket_start"]: r["vmean"] for r in eng.aligned_windows(u, -(1 << 45), 1 << 62, pw).collect()}
    model: dict[int, list[float]] = {}
    for t, v in data:
        model.setdefault((t // width) * width, []).append(v)
    q = Decimal("0.000001")
    for b, vs in model.items():
        dec_sum = sum(Decimal(v).quantize(q, rounding=ROUND_HALF_UP) for v in vs)
        assert got[b] == float(dec_sum) / len(vs)


def test_delete_then_readback(loaded):
    eng, u, data, _ = loaded
    times = sorted(t for t, _ in data)
    s, e = times[len(times) // 3], times[2 * len(times) // 3]
    v = eng.delete_range(u, s, e)
    got = [(r["time"], r["value"]) for r in eng.raw_values(u, -(1 << 45), 1 << 62).collect()]
    want = sorted((t, val) for (t, val) in data if not (s <= t < e))
    assert got == want
    # previous version still sees everything (COW)
    got_old = [
        (r["time"], r["value"])
        for r in eng.raw_values(u, -(1 << 45), 1 << 62, version=v - 1).collect()
    ]
    assert got_old == sorted(data)
