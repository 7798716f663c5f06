"""Crash-injection tests for the atomic generation-pointer store.

The reference's commit is a superblock flip after all blocks are durable
(internal/bstore/blockstore.go:317-360): a crash at ANY instant leaves
either the old or the new table fully live, never a missing/half-swapped
one. btrdb_spark/store.py reproduces that contract for parquet tables;
these tests kill the rewrite at each step and assert the table is still
whole.
"""

from __future__ import annotations

import os

import pytest

from btrdb_spark import store
from btrdb_spark.engine import BTrDBEngine


class Boom(RuntimeError):
    pass


@pytest.fixture()
def engine(spark, tmp_path):
    return BTrDBEngine(spark, str(tmp_path / "db"), flush_threshold=10_000)


def _crash_publish(monkeypatch):
    """Make every pointer flip die AFTER the new generation is written but
    BEFORE it becomes live — the worst instant of the old rmtree+rename."""
    # patch the backend class so every engine (whatever backend instance
    # it holds, incl. store.DEFAULT) dies at the flip
    monkeypatch.setattr(
        store.PosixStore, "publish", lambda *a, **k: (_ for _ in ()).throw(Boom())
    )


def test_compact_crash_preserves_table(engine, monkeypatch):
    u = engine.create_stream("c/crash")
    for b in range(3):
        engine.insert(u, [(b * 100 + i, float(i)) for i in range(20)], sync=True)
    before = engine.raw_values(u, 0, 10**9).collect()
    _crash_publish(monkeypatch)
    with pytest.raises(Boom):
        engine.compact_points()
    assert engine.raw_values(u, 0, 10**9).collect() == before
    monkeypatch.undo()
    engine.compact_points()  # recovery: the same op succeeds afterwards
    assert engine.raw_values(u, 0, 10**9).collect() == before


def test_obliterate_crash_preserves_stream(engine, monkeypatch):
    u = engine.create_stream("c/ob", tags={"k": "v"})
    engine.insert(u, [(i, float(i)) for i in range(50)], sync=True)
    before = engine.raw_values(u, 0, 10**9).collect()
    _crash_publish(monkeypatch)
    with pytest.raises(Boom):
        engine.obliterate(u)
    # first publish dies in the metadata tombstone step -> stream intact
    assert engine.streams.filter("uuid = '%s'" % u).count() == 1
    assert engine.raw_values(u, 0, 10**9).collect() == before
    monkeypatch.undo()
    engine.obliterate(u)
    assert engine.raw_values(u, 0, 10**9).count() == 0


def test_annotation_cas_crash_preserves_metadata(engine, monkeypatch):
    u = engine.create_stream("c/cas")
    _crash_publish(monkeypatch)
    with pytest.raises(Boom):
        engine.set_annotations(u, 1, {"owner": "a"})
    row = engine.streams.filter("uuid = '%s'" % u).first()
    assert row["annotations"] in (None, {})  # CAS never half-applied
    assert row["annotation_version"] == 1
    monkeypatch.undo()
    engine.set_annotations(u, 1, {"owner": "a"})
    assert engine.streams.filter("uuid = '%s'" % u).first()["annotations"] == {"owner": "a"}


def test_flush_clear_hot_crash_keeps_buffer(engine, monkeypatch):
    """A crash while clearing the hot buffer must not lose buffered rows:
    worst case is replayed duplicates handled upstream, never data loss."""
    warm = engine.create_stream("c/warm")
    engine.insert(warm, [(1, 1.0)], sync=True)  # tables exist + published
    u = engine.create_stream("c/hot")
    engine.insert(u, [(i, float(i)) for i in range(5)])  # buffered only
    assert engine.hot.count() == 5
    _crash_publish(monkeypatch)
    with pytest.raises(Boom):
        engine.flush(u)  # cold append (no flip) ok; dies clearing the buffer
    # the buffer is still whole (not half-gone): at-least-once, never loss
    assert engine.hot.count() == 5
    monkeypatch.undo()


def test_legacy_flat_layout_still_mutable(spark, tmp_path):
    """Tables written before the pointer layout (bare `streams/` dir, no
    partitioning) must stay readable AND mutable: the rewrite path falls
    back to a whole-table (dimension-sized) rewrite into a new
    generation."""
    from btrdb_spark.schemas import STREAMS_SCHEMA

    base = str(tmp_path / "old")
    os.makedirs(base)
    spark.createDataFrame(
        [("u-1", "c/legacy", {"unit": "kw"}, {}, 1, None)], STREAMS_SCHEMA
    ).write.parquet(f"{base}/streams")
    eng = BTrDBEngine(spark, base)
    assert eng.streams.count() == 1
    eng.set_annotations("u-1", 1, {"owner": "ops"})
    row = eng.streams.first()
    assert row["annotations"] == {"owner": "ops"} and row["annotation_version"] == 2
    assert store.resolve(base, "streams").endswith(".g0")  # migrated


def test_vacuum_reaps_old_generations(engine):
    u = engine.create_stream("c/vac")
    engine.insert(u, [(i, float(i)) for i in range(30)], sync=True)
    before = engine.raw_values(u, 0, 10**9).collect()
    for _ in range(3):
        engine.compact_points()  # each compaction strands a generation
    removed = engine.vacuum(keep=1)
    assert removed.get("points", 0) >= 1
    assert engine.raw_values(u, 0, 10**9).collect() == before


def test_publish_is_pointer_flip_and_gc_spares_live(tmp_path):
    base = str(tmp_path / "t")
    os.makedirs(base)
    g0 = store.current_dir(base, "tbl", create=True)
    assert store.resolve(base, "tbl") == g0
    g1 = store.new_generation(base, "tbl")
    # not live until published
    assert store.resolve(base, "tbl") == g0
    store.publish(base, "tbl", g1)
    assert store.resolve(base, "tbl") == g1
    g2 = store.new_generation(base, "tbl")
    store.publish(base, "tbl", g2)
    victims = store.gc_generations(base, "tbl", keep=1)
    assert g0 in victims and os.path.exists(g2) and store.resolve(base, "tbl") == g2


def test_compact_crash_preserves_table_manifest_backend(spark, tmp_path, monkeypatch):
    """Same superblock contract on the no-rename object-store backend: a
    crash at the put-if-absent commit leaves the old generation live."""
    eng = BTrDBEngine(
        spark, str(tmp_path / "db"), flush_threshold=10_000,
        store_backend=store.ManifestLogStore(),
    )
    u = eng.create_stream("c/crash2")
    for b in range(3):
        eng.insert(u, [(b * 100 + i, float(i)) for i in range(20)], sync=True)
    before = eng.raw_values(u, 0, 10**9).collect()
    monkeypatch.setattr(
        store.ManifestLogStore, "publish", lambda *a, **k: (_ for _ in ()).throw(Boom())
    )
    with pytest.raises(Boom):
        eng.compact_points()
    assert eng.raw_values(u, 0, 10**9).collect() == before
    monkeypatch.undo()
    eng.compact_points()
    assert eng.raw_values(u, 0, 10**9).collect() == before
