"""Persisted partition layout: a store must keep answering correctly (and
rewriting the right partition directories) after the module-level fanout
defaults change — the bucket modulus is baked into directory names, so the
written-with values must drive pruning forever (LAYOUT.json contract)."""

from __future__ import annotations

import json
import os

import pytest

from btrdb_spark import engine as eng_mod
from btrdb_spark.engine import BTrDBEngine


def _mk(spark, path, **kw):
    return BTrDBEngine(spark, str(path), flush_threshold=100, **kw)


def test_layout_persisted_and_survives_constant_change(spark, tmp_path, monkeypatch):
    db = tmp_path / "db"
    e1 = _mk(spark, db)
    u = e1.create_stream("c/a")
    e1.insert(u, [(10, 1.0), (20, 2.0), (3_000_000, 3.0)], sync=True)
    layout = json.loads((db / "LAYOUT.json").read_text())
    assert layout["n_uuid_buckets"] == eng_mod.N_UUID_BUCKETS

    # simulate a release that bumps the default fanout + time shift
    monkeypatch.setattr(eng_mod, "N_UUID_BUCKETS", 5)
    monkeypatch.setattr(eng_mod, "TIME_PARTITION_PW", 13)
    e2 = _mk(spark, db)
    # stored values win over the new defaults
    assert e2.n_uuid_buckets == layout["n_uuid_buckets"]
    assert e2.time_partition_pw == layout["time_partition_pw"]
    # pruned reads still see every row
    got = {(r["time"], r["value"]) for r in e2.raw_values(u, 0, 1 << 50).collect()}
    assert got == {(10, 1.0), (20, 2.0), (3_000_000, 3.0)}
    # per-stream rewrites still target the right directory: insert+flush
    # (clear_hot) and delete under the old layout
    e2.insert(u, [(30, 4.0)], sync=True)
    e2.delete_range(u, 15, 25)
    got = {(r["time"], r["value"]) for r in e2.raw_values(u, 0, 1 << 50).collect()}
    assert got == {(10, 1.0), (30, 4.0), (3_000_000, 3.0)}


def test_legacy_store_mismatched_fanout_fails_loudly(spark, tmp_path, monkeypatch):
    db = tmp_path / "db"
    e1 = _mk(spark, db)
    u = e1.create_stream("c/a")
    e1.insert(u, [(10, 1.0)], sync=True)
    # a store from before LAYOUT.json existed, written at a different fanout
    os.remove(db / "LAYOUT.json")
    monkeypatch.setattr(eng_mod, "N_UUID_BUCKETS", 7)
    with pytest.raises(RuntimeError, match="LAYOUT.json"):
        _mk(spark, db)


def test_legacy_store_matching_layout_is_adopted(spark, tmp_path):
    db = tmp_path / "db"
    e1 = _mk(spark, db)
    u = e1.create_stream("c/a")
    e1.insert(u, [(10, 1.0)], sync=True)
    os.remove(db / "LAYOUT.json")
    e2 = _mk(spark, db)  # sample-validates, then stamps LAYOUT.json
    assert json.loads((db / "LAYOUT.json").read_text())["n_uuid_buckets"] == (
        e2.n_uuid_buckets
    )
    assert e2.raw_values(u, 0, 1 << 50).count() == 1


def test_compact_points_migrates_layout(spark, tmp_path):
    db = tmp_path / "db"
    e1 = _mk(spark, db)
    u1 = e1.create_stream("c/a")
    u2 = e1.create_stream("c/b")
    e1.insert(u1, [(10, 1.0), (1 << 48, 2.0)], sync=True)
    e1.insert(u2, [(20, 3.0)], sync=True)
    e1.compact_points(n_uuid_buckets=4, time_partition_pw=40)
    assert json.loads((db / "LAYOUT.json").read_text()) == {
        "n_uuid_buckets": 4,
        "time_partition_pw": 40,
    }
    # reopen: new layout loads, reads prune correctly, rewrites land
    e2 = _mk(spark, db)
    assert e2.n_uuid_buckets == 4 and e2.time_partition_pw == 40
    got = {(r["time"], r["value"]) for r in e2.raw_values(u1, 0, 1 << 50).collect()}
    assert got == {(10, 1.0), (1 << 48, 2.0)}
    e2.delete_range(u1, 0, 15)
    got = {(r["time"], r["value"]) for r in e2.raw_values(u1, 0, 1 << 50).collect()}
    assert got == {(1 << 48, 2.0)}
    # metadata rewrites (re-bucketed streams table) still hit the right row
    e2.set_annotations(u2, 1, {"k": "v"})
    anns = e2.streams.filter(f"uuid = '{u2}'").collect()[0]["annotations"]
    assert anns == {"k": "v"}
    assert e2.raw_values(u2, 0, 1 << 50).count() == 1
