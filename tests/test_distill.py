"""DISTIL-style derived-stream maintenance (plans/distill.py).

The invariant under test is the DISTIL contract: after update(), the
output stream equals a from-scratch computation of the kernel over the
CURRENT inputs — no matter what sequence of inserts/deletes produced
them — while each update touches only changed ranges."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from btrdb_spark.engine import BTrDBEngine
from btrdb_spark.plans import distill


@pytest.fixture()
def engine(spark, tmp_path):
    return BTrDBEngine(spark, str(tmp_path / "db"), flush_threshold=10_000)


def _mk_inputs(engine):
    a = engine.create_stream("grid/pmu", tags={"name": "a"})
    b = engine.create_stream("grid/pmu", tags={"name": "b"})
    engine.insert(a, [(t, float(t % 7)) for t in range(0, 2000, 10)], sync=True)
    engine.insert(b, [(t, float(t % 5)) for t in range(0, 2000, 20)], sync=True)
    return a, b


def _expected_sum(engine, a, b):
    fa = engine.raw_values(a, -(1 << 62), 1 << 62).groupBy("time").agg(
        F.max("value").alias("va")
    )
    fb = engine.raw_values(b, -(1 << 62), 1 << 62).groupBy("time").agg(
        F.max("value").alias("vb")
    )
    return {
        (r.time, r.va + r.vb)
        for r in fa.join(fb, "time").collect()
    }


def _out_points(engine, out):
    return {
        (r.time, r.value)
        for r in engine.raw_values(out, -(1 << 62), 1 << 62).collect()
    }


def _dist(a, b):
    return distill.Distillate(
        name="sum_ab",
        output_uuid="00000000-0000-0000-0000-00000000d157",
        inputs=[a, b],
        fn=distill.aligned_sum_kernel,
        resolution=8,
    )


def test_initial_materialize_equals_full_compute(engine):
    a, b = _mk_inputs(engine)
    d = _dist(a, b)
    distill.register(engine, d)
    ranges = distill.update(engine, d)
    assert ranges, "initial build must recompute the populated range"
    assert _out_points(engine, d.output_uuid) == _expected_sum(engine, a, b)


def test_incremental_update_tracks_edits(engine):
    a, b = _mk_inputs(engine)
    d = _dist(a, b)
    distill.register(engine, d)
    distill.update(engine, d)

    # edit a middle window of input a (new overlapping points) and delete
    # a slice of input b; the distillate must converge to the new truth
    engine.insert(a, [(t, 100.0) for t in range(500, 700, 10)], sync=True)
    engine.delete_range(b, 1000, 1400)
    ranges = distill.update(engine, d)
    assert ranges
    # recompute was range-scoped, not full-history
    total = sum(e - s for s, e in ranges)
    assert total < 1900, f"recomputed {total} ns of a 2000 ns stream"
    assert _out_points(engine, d.output_uuid) == _expected_sum(engine, a, b)


def test_update_is_idempotent_and_noop_when_clean(engine):
    a, b = _mk_inputs(engine)
    d = _dist(a, b)
    distill.register(engine, d)
    distill.update(engine, d)
    before = _out_points(engine, d.output_uuid)
    ver_before = engine.stream_version(d.output_uuid)
    assert distill.update(engine, d) == []          # nothing changed
    assert engine.stream_version(d.output_uuid) == ver_before
    assert _out_points(engine, d.output_uuid) == before


def test_scale_offset_kernel(engine):
    a = engine.create_stream("grid/pmu", tags={"name": "solo"})
    engine.insert(a, [(t, float(t)) for t in range(0, 100, 5)], sync=True)
    d = distill.Distillate(
        name="c2f",
        output_uuid="00000000-0000-0000-0000-00000000d158",
        inputs=[a],
        fn=distill.scale_offset_kernel(1.8, 32.0),
        resolution=4,
    )
    distill.register(engine, d)
    distill.update(engine, d)
    got = _out_points(engine, d.output_uuid)
    assert got == {(t, 1.8 * t + 32.0) for t in range(0, 100, 5)}


def test_bucket_mean_sum_kernel_incremental(engine):
    """Grid-aligned kernel: a partially-dirty bucket is rebuilt whole."""
    a, b = _mk_inputs(engine)
    d = distill.Distillate(
        name="bucket_sum",
        output_uuid="00000000-0000-0000-0000-00000000d15a",
        inputs=[a, b],
        fn=distill.bucket_mean_sum_kernel(6),   # 64 ns buckets
        align_pw=6,
        resolution=4,
    )
    distill.register(engine, d)
    distill.update(engine, d)

    def expected():
        fa = engine.raw_values(a, -(1 << 62), 1 << 62)
        fb = engine.raw_values(b, -(1 << 62), 1 << 62)
        rows = distill.bucket_mean_sum_kernel(6)(
            {"a": fa.select("time", "value"), "b": fb.select("time", "value")},
            None,
            None,
        ).collect()
        return {(r.time, r.value) for r in rows}

    assert _out_points(engine, d.output_uuid) == expected()
    # dirty a sliver inside one bucket; the whole bucket must refresh
    engine.insert(a, [(130, 9.5)], sync=True)
    ranges = distill.update(engine, d)
    assert ranges and all(s % 64 == 0 and e % 64 == 0 for s, e in ranges)
    assert _out_points(engine, d.output_uuid) == expected()


def test_distillate_of_distillate(engine):
    """A distillate output is a normal versioned stream: chain one."""
    a, b = _mk_inputs(engine)
    d1 = _dist(a, b)
    distill.register(engine, d1)
    distill.update(engine, d1)
    d2 = distill.Distillate(
        name="sum_scaled",
        output_uuid="00000000-0000-0000-0000-00000000d159",
        inputs=[d1.output_uuid],
        fn=distill.scale_offset_kernel(2.0, 0.0),
        resolution=8,
    )
    distill.register(engine, d2)
    distill.update(engine, d2)
    expect = {(t, 2.0 * v) for t, v in _out_points(engine, d1.output_uuid)}
    assert _out_points(engine, d2.output_uuid) == expect

    # upstream edit propagates through the chain
    engine.insert(a, [(40, 50.0)], sync=True)
    distill.update(engine, d1)
    distill.update(engine, d2)
    expect = {(t, 2.0 * v) for t, v in _out_points(engine, d1.output_uuid)}
    assert _out_points(engine, d2.output_uuid) == expect
    assert _out_points(engine, d1.output_uuid) == _expected_sum(engine, a, b)
