"""btrdb-python-style client facade: the porting surface for reference
users (method-per-RPC over the engine; serve.go:116-872)."""

from __future__ import annotations

import pytest

from btrdb_spark.client import ChangedRange, RawPoint, StatPoint, connect

NS = 1_000_000_000


@pytest.fixture()
def conn(spark, tmp_path):
    return connect(spark, str(tmp_path / "db"))


def test_lifecycle_roundtrip(conn):
    s = conn.create(None, "campus/b1/m1", tags={"unit": "kw"}, annotations={"ow": "ops"})
    assert conn.list_collections() == ["campus/b1/m1"]
    assert s.collection() == "campus/b1/m1" and s.tags() == {"unit": "kw"}
    anns, ver = s.annotations()
    assert anns == {"ow": "ops"} and ver == 1

    v = s.insert([(i * NS, float(i)) for i in range(10)], sync=True)
    assert v == 10 and s.version() == 10
    assert s.values(0, 10 * NS) == [RawPoint(i * NS, float(i)) for i in range(10)]
    assert s.earliest() == RawPoint(0, 0.0)
    assert s.latest() == RawPoint(9 * NS, 9.0)
    assert s.count(2 * NS, 7 * NS) == 5

    # stat surfaces carry the proto StatPoint shape (btrdb.proto:214-220)
    [w] = s.windows(0, 10 * NS, 10 * NS)
    assert w == StatPoint(0, 0.0, 4.5, 9.0, 10)
    # end snaps DOWN to the 2^pw grid (quasar.go:279-283) — use a whole
    # number of buckets so every point is covered
    aw = s.aligned_windows(0, 1 << 34, 33)
    assert sum(p.count for p in aw) == 10

    # versioned delete: old version still shows the data
    v2 = s.delete(0, 5 * NS)
    assert v2 == 11
    assert [p.time for p in s.values(0, 10 * NS)] == [i * NS for i in range(5, 10)]
    assert len(s.values(0, 10 * NS, version=10)) == 10
    ch = s.changes(10, None, 30)
    assert ch and all(isinstance(c, ChangedRange) for c in ch)

    # CAS metadata update bumps the property version
    assert s.update({"ow": "sre"}) == 2
    assert s.annotations() == ({"ow": "sre"}, 2)

    s.obliterate()
    with pytest.raises(KeyError):
        conn.stream_from_uuid(s.uuid)


def test_generate_csv_aligns_streams(conn):
    a = conn.create(None, "csv/a")
    b = conn.create(None, "csv/b")
    a.insert([(0, 1.0), (2 * NS, 3.0)], sync=True)
    b.insert([(0, 9.0), (1 * NS, 8.0)], sync=True)
    rows = conn.generate_csv([a, b], 0, 10 * NS, labels=["a", "b"], rfc3339=False)
    assert rows == [(0, 1.0, 9.0), (1 * NS, None, 8.0), (2 * NS, 3.0, None)]


def test_csv_rfc3339_pre_epoch_floor(conn):
    """Negative (pre-1970) ns timestamps floor toward -inf in the µs
    conversion (operators/csv.py), matching every other ns conversion."""
    s = conn.create(None, "csv/neg")
    t = -1_500  # 1.5µs before the epoch -> floors to -2µs, not -1µs
    s.insert([(t, 4.0)], sync=True)
    [row] = conn.generate_csv([s], -10 * NS, NS, labels=["v"])
    assert row[0] == t
    assert row[1] == "1969-12-31T23:59:59.999998Z"  # -2µs rendered
    assert row[2] == 4.0


def test_discovery(conn):
    a = conn.create(None, "site/x", tags={"unit": "v"})
    conn.create(None, "site/y", tags={"unit": "a"})
    conn.create(None, "other/z", tags={"unit": "v"})
    got = conn.streams_in_collection("site", tags={"unit": "v"})
    assert [st.uuid for st in got] == [a.uuid]
    assert len(conn.streams_in_collection("")) == 3
    assert conn.stream_from_uuid(a.uuid).uuid == a.uuid
    assert conn.info()["n_streams"] == 3


def test_batch_delete_via_client(conn):
    a = conn.create(None, "batch/a")
    b = conn.create(None, "batch/b")
    a.insert([(i * NS, float(i)) for i in range(10)], sync=True)
    b.insert([(i * NS, float(i)) for i in range(10)], sync=True)
    vers = conn.delete_ranges([(a.uuid, 0, 5 * NS), (b.uuid, 5 * NS, 10 * NS)])
    assert vers[a.uuid] == 11 and vers[b.uuid] == 11
    assert [p.time for p in a.values(0, 100 * NS)] == [i * NS for i in range(5, 10)]
    assert [p.time for p in b.values(0, 100 * NS)] == [i * NS for i in range(5)]
