"""Network endpoint round-trip (VERDICT r5 ask #6): a client on localhost
drives Create/Insert/RawValues/AlignedWindows/Windows/DeleteRange through
the HTTP service and gets byte-equal answers to the in-process engine,
with the reference's 5,000-row response batching (serve.go:58)."""

from __future__ import annotations

import pytest

from btrdb_spark.engine import BTrDBEngine
from btrdb_spark.service import RESULTS_BATCH_SIZE, BTrDBHttpClient, BTrDBService, RpcError


@pytest.fixture()
def served(spark, tmp_path):
    eng = BTrDBEngine(spark, str(tmp_path / "svc"), flush_threshold=10**9, ladder=True)
    svc = BTrDBService(eng)
    port = svc.start()
    yield eng, BTrDBHttpClient("127.0.0.1", port)
    svc.stop()


def test_full_rpc_roundtrip(served):
    eng, cli = served
    u = cli.call("Create", collection="svc/a", tags={"unit": "kw"})[0]["uuid"]

    # insert 12k points across chunks (25k RPC cap mirrors serve.go:57)
    pts = [(i * 10**6, float(i % 251)) for i in range(12000)]
    for lo in range(0, len(pts), 10000):
        res = cli.call("Insert", uuid=u, values=pts[lo : lo + 10000])[0]
    cli.call("Flush", uuid=u)

    info = cli.call("StreamInfo", uuid=u)[0]
    assert info["collection"] == "svc/a" and info["tags"] == {"unit": "kw"}
    assert info["versionMajor"] == 10 and info["versionMinor"] == 0

    # RawValues: >2 batches of <=5000, time-ordered, version-stamped
    chunks = cli.call("RawValues", uuid=u, start=0, end=2**62)
    assert all(len(c["batch"]) <= RESULTS_BATCH_SIZE for c in chunks)
    assert sum(len(c["batch"]) for c in chunks) == 12000
    assert len(chunks) >= 3 and chunks[-1]["final"] and not chunks[0]["final"]
    assert chunks[0]["versionMajor"] == 10
    rows = [r for c in chunks for r in c["batch"]]
    assert [r["time"] for r in rows] == [t for t, _ in pts]

    # AlignedWindows equals the in-process engine exactly
    _meta, got = cli.rows("AlignedWindows", uuid=u, start=0, end=2**62, pointWidth=30)
    want = {
        r["bucket_start"]: (r["cnt"], r["vmin"], r["vmean"], r["vmax"])
        for r in eng.aligned_windows(u, 0, 2**62, 30).collect()
    }
    assert {r["time"]: (r["count"], r["vmin"], r["vmean"], r["vmax"]) for r in got} == want

    # Windows (arbitrary width) round-trips too; the end is rounded DOWN
    # to a whole window (quasar.go:322-324): 17 x 0.7s windows cover
    # [0, 11.9e9) -> 11900 of the 12000 points
    _meta, win = cli.rows("Windows", uuid=u, start=0, end=12000 * 10**6, width=7 * 10**8)
    assert len(win) == 17
    assert sum(r["count"] for r in win) == 11900

    # Nearest both directions
    assert cli.call("Nearest", uuid=u, time=5 * 10**6 + 1, backward=True)[0]["time"] == 5 * 10**6
    assert cli.call("Nearest", uuid=u, time=5 * 10**6 + 1, backward=False)[0]["time"] == 6 * 10**6

    # DeleteRange bumps the version; post-delete reads shrink
    dv = cli.call("DeleteRange", uuid=u, start=0, end=6000 * 10**6)[0]["versionMajor"]
    assert dv == 11
    _meta, rows2 = cli.rows("RawValues", uuid=u, start=0, end=2**62)
    assert len(rows2) == 6000
    # at-version read still sees the pre-delete history
    _meta, rows10 = cli.rows("RawValues", uuid=u, start=0, end=2**62, versionMajor=10)
    assert len(rows10) == 12000

    # ChangedRanges between the two versions covers the deleted span
    _meta, ch = cli.rows("ChangedRanges", uuid=u, fromMajor=10, toMajor=11, resolution=30)
    assert ch and ch[0]["range_start"] <= 0 and ch[-1]["range_end"] >= 6000 * 10**6

    # metadata plane
    _meta, cols = cli.rows("ListCollections", prefix="svc")
    assert [c["collection"] for c in cols] == ["svc/a"]
    _meta, found = cli.rows("LookupStreams", collection="svc", isPrefix=True)
    assert [s["uuid"] for s in found] == [u]

    # annotations CAS
    cli.call("SetStreamAnnotations", uuid=u, expectedAnnotationVersion=1, changes={"owner": "t1"})
    assert cli.call("StreamInfo", uuid=u)[0]["annotations"] == {"owner": "t1"}

    assert cli.call("Info")[0]["engine"] == "btrdb_spark"


def test_delete_ranges_rpc_batch(served):
    eng, cli = served
    us = []
    for name in ("a", "b"):
        u = cli.call("Create", collection=f"svc/batch{name}")[0]["uuid"]
        cli.call("Insert", uuid=u, values=[(i * 10**6, 1.0) for i in range(100)])
        cli.call("Flush", uuid=u)
        us.append(u)
    out = cli.call(
        "DeleteRanges",
        ranges=[
            {"uuid": us[0], "start": 0, "end": 50 * 10**6},
            {"uuid": us[1], "start": 0, "end": 25 * 10**6},
        ],
    )[0]["versions"]
    assert out[us[0]] == 11 and out[us[1]] == 11
    _m, r0 = cli.rows("RawValues", uuid=us[0], start=0, end=2**62)
    _m, r1 = cli.rows("RawValues", uuid=us[1], start=0, end=2**62)
    assert len(r0) == 50 and len(r1) == 75


def test_rpc_errors_surface_as_status(served):
    _eng, cli = served
    with pytest.raises(RpcError) as e:
        cli.call("RawValues", uuid="no-such-uuid", start=0, end=1)
    assert e.value.code in (400, 404, 500)
    with pytest.raises(RpcError) as e2:
        cli.call("NoSuchMethod")
    assert e2.value.code == 404
    # oversized insert rejected like serve.go:57
    u = cli.call("Create", collection="svc/err")[0]["uuid"]
    with pytest.raises(RpcError):
        cli.call("Insert", uuid=u, values=[(i, 1.0) for i in range(25001)])


def test_concurrent_readers(served):
    """ThreadingHTTPServer: parallel RawValues from several client threads
    all stream consistent results (reads are MVCC, lock-free)."""
    import threading

    _eng, cli = served
    u = cli.call("Create", collection="svc/c")[0]["uuid"]
    cli.call("Insert", uuid=u, values=[(i, float(i)) for i in range(2000)], sync=True)
    out: list[int] = []
    lock = threading.Lock()

    def read():
        _m, rows = cli.rows("RawValues", uuid=u, start=0, end=10**9)
        with lock:
            out.append(len(rows))

    threads = [threading.Thread(target=read) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert out == [2000, 2000, 2000, 2000]


def test_midstream_failure_emits_terminal_error_chunk(served, monkeypatch):
    """ADVICE r6 #3: a Spark failure RAISED WHILE ITERATING a streaming
    result (after the 200 + headers are sent) must surface as the
    documented terminal {"error": ...} chunk, not a truncated stream."""
    _eng, cli = served
    u = cli.call("Create", collection="svc/mid")[0]["uuid"]
    cli.call("Insert", uuid=u, values=[(i, float(i)) for i in range(8000)], sync=True)

    import btrdb_spark.service as svcmod

    real = svcmod._batches

    def exploding(df, cols):
        it = real(df, cols)
        yield next(it)  # first batch goes out fine -> headers are sent
        raise RuntimeError("executor lost mid-scan")

    monkeypatch.setattr(svcmod, "_batches", exploding)
    with pytest.raises(RpcError) as e:
        cli.call("RawValues", uuid=u, start=0, end=2**62)
    assert e.value.code == 500 and "mid-scan" in e.value.msg


def test_generic_query_rpc_serves_registry(spark, tmp_path):
    """r6 verdict #7: the extension operators reach the wire through one
    generic Query RPC with the standard batching contract."""
    import __spark_entry__ as entrymod

    eng = BTrDBEngine(spark, str(tmp_path / "q"), flush_threshold=10**9)
    svc = BTrDBService(
        eng, queries=entrymod.queries(), sf_dir="/root/testdata/sf0.001"
    )
    port = svc.start()
    try:
        cli = BTrDBHttpClient("127.0.0.1", port)
        names = cli.call("ListQueries")[0]["queries"]
        assert "dedup_exact" in names and "weighted_sample" in names
        meta, rows = cli.rows("Query", name="weighted_sample", limit=16)
        assert meta["columns"] == ["draw_id", "doc_id", "weight"]
        assert len(rows) == 16
        assert all(r["weight"] > 0 for r in rows)
        with pytest.raises(RpcError) as e:
            cli.call("Query", name="no_such_op")
        assert e.value.code == 404
    finally:
        svc.stop()


def test_streaming_sketch_rpcs(served, spark, tmp_path):
    """r6 verdict #5: a client starts a live HLL sketch over a watched
    directory, polls the estimate as files land, and stops it."""
    import time as _t

    from pyspark.sql import functions as F

    from btrdb_spark.functions import sketches

    _eng, cli = served
    src = tmp_path / "sk_src"
    rows = spark.range(800).select(
        (F.col("id") % 2).cast("string").alias("g"), (F.col("id") % 500).alias("u")
    )
    rows.write.parquet(str(src / "w1.parquet"))
    batch = {r["g"]: r for r in sketches.distinct_hll(rows, ["g"], "u", b=9).collect()}
    cli.call(
        "StartSketch", kind="hll", name="svc_hll", path=str(src) + "/*.parquet",
        schema="g string, u long", groupCol="g", keyCol="u", b=9,
        checkpoint=str(tmp_path / "sk_ckpt"),
    )
    try:
        latest: dict = {}
        deadline = _t.time() + 60
        while _t.time() < deadline:
            _meta, got = cli.rows("PollSketch", name="svc_hll")
            for r in got:
                latest[r["group"]] = r
            if set(latest) == {"0", "1"} and all(
                latest[g]["est_hll"] == batch[g]["est_hll"] for g in ("0", "1")
            ):
                break
            _t.sleep(1)
        for g in ("0", "1"):
            assert latest[g]["est_hll"] == batch[g]["est_hll"]
    finally:
        cli.call("StopSketch", name="svc_hll")
    with pytest.raises(RpcError):
        cli.call("PollSketch", name="svc_hll")


def test_sketch_results_compaction_bounds_files(served, spark, tmp_path):
    """The foreachBatch sink compacts the results dir every
    compactEvery epochs to one latest-per-group snapshot, so file count
    stays bounded while Poll keeps serving the exact estimates."""
    import glob
    import time as _t

    from pyspark.sql import functions as F

    from btrdb_spark.functions import sketches

    _eng, cli = served
    src = tmp_path / "ck_src"
    src.mkdir()
    all_rows = spark.range(500).select(
        (F.col("id") % 2).cast("string").alias("g"), (F.col("id") % 250).alias("u")
    )
    batch = {r["g"]: r for r in sketches.distinct_kmv(all_rows, ["g"], "u", k=64).collect()}
    # 6 files -> 6 epochs with maxFilesPerTrigger=1; compactEvery=2
    for i in range(6):
        all_rows.filter((F.col("u") % 6) == i).coalesce(1).write.parquet(
            str(src / f"w{i}.parquet")
        )
    res_dir = str(tmp_path / "ck_results")
    cli.call(
        "StartSketch", kind="kmv", name="svc_kmv_c", path=str(src) + "/*",
        schema="g string, u long", groupCol="g", keyCol="u", k=64,
        checkpoint=str(tmp_path / "ck_ckpt"), results=res_dir,
        maxFilesPerTrigger=1, compactEvery=2,
    )
    try:
        latest: dict = {}
        deadline = _t.time() + 90
        while _t.time() < deadline:
            _meta, got = cli.rows("PollSketch", name="svc_kmv_c")
            latest = {r["group"]: r for r in got}
            if set(latest) == {"0", "1"} and all(
                latest[g]["est_distinct"] == batch[g]["est_distinct"]
                for g in ("0", "1")
            ):
                break
            _t.sleep(1)
        for g in ("0", "1"):
            assert latest[g]["est_distinct"] == batch[g]["est_distinct"]
        # compaction ran: far fewer files than epochs+snapshots appended
        n_files = len(glob.glob(f"{res_dir}/*.parquet"))
        assert n_files <= 4, f"results dir not compacted: {n_files} files"
    finally:
        cli.call("StopSketch", name="svc_kmv_c")


def test_sketch_poll_survives_restart(served, spark, tmp_path):
    """r7 verdict #6: the results table is durable — after the sketch
    query is killed and restarted with the same checkpoint + results
    path, PollSketch serves the FULL pre-restart group set immediately
    (the memory sink could only serve post-restart groups)."""
    import time as _t

    from pyspark.sql import functions as F

    from btrdb_spark.functions import sketches

    _eng, cli = served
    src = tmp_path / "rk_src"
    rows = spark.range(600).select(
        (F.col("id") % 2).cast("string").alias("g"), (F.col("id") % 300).alias("u")
    )
    rows.write.parquet(str(src / "w1.parquet"))
    batch = {r["g"]: r for r in sketches.distinct_kmv(rows, ["g"], "u", k=64).collect()}
    args = dict(
        kind="kmv", name="svc_kmv_r", path=str(src) + "/*.parquet",
        schema="g string, u long", groupCol="g", keyCol="u", k=64,
        checkpoint=str(tmp_path / "rk_ckpt"),
    )
    cli.call("StartSketch", **args)
    try:
        latest: dict = {}
        deadline = _t.time() + 60
        while _t.time() < deadline:
            _meta, got = cli.rows("PollSketch", name="svc_kmv_r")
            latest = {r["group"]: r for r in got}
            if set(latest) == {"0", "1"} and all(
                latest[g]["est_distinct"] == batch[g]["est_distinct"]
                for g in ("0", "1")
            ):
                break
            _t.sleep(1)
        assert set(latest) == {"0", "1"}
    finally:
        cli.call("StopSketch", name="svc_kmv_r")  # simulated crash/restart

    # restart with the same checkpoint: the full group set is served
    # from the durable results table BEFORE any new file lands
    cli.call("StartSketch", **args)
    try:
        _meta, got = cli.rows("PollSketch", name="svc_kmv_r")
        again = {r["group"]: r for r in got}
        assert set(again) == {"0", "1"}
        for g in ("0", "1"):
            assert again[g]["est_distinct"] == batch[g]["est_distinct"]
    finally:
        cli.call("StopSketch", name="svc_kmv_r")


def test_metadata_usage_rpc(served):
    """Named GetMetadataUsage endpoint (serve.go:416-454): per-key
    tag/annotation stream counts under a prefix, as KeyCount lists."""
    _eng, cli = served
    cli.call("Create", collection="mu/a", tags={"unit": "kw"},
             annotations={"site": "x"})
    cli.call("Create", collection="mu/b", tags={"unit": "v", "phase": "A"})
    cli.call("Create", collection="other/c", tags={"unit": "v"})

    res = cli.call("GetMetadataUsage", prefix="mu/")[0]
    tags = {t["key"]: t["count"] for t in res["tags"]}
    anns = {a["key"]: a["count"] for a in res["annotations"]}
    assert tags == {"unit": 2, "phase": 1}
    assert anns == {"site": 1}
    # no prefix: everything
    res = cli.call("GetMetadataUsage")[0]
    assert {t["key"]: t["count"] for t in res["tags"]} == {"unit": 3, "phase": 1}


def test_generate_csv_rpc_roundtrip(served):
    """Named GenerateCSV endpoint (serve.go:874-1005): header row per
    csv.go layout, RFC3339 second column, raw + windows modes, the
    5,000-row batching, and includeVersions header suffixes."""
    _eng, cli = served
    ua = cli.call("Create", collection="csv/a")[0]["uuid"]
    ub = cli.call("Create", collection="csv/b")[0]["uuid"]
    # 6k points on a, 3k on b (every other second) -> >1 batch of rows
    cli.call("Insert", uuid=ua,
             values=[(i * 10**9, float(i)) for i in range(6000)])
    cli.call("Insert", uuid=ub,
             values=[(i * 2 * 10**9, float(-i)) for i in range(3000)])
    cli.call("Flush", uuid=ua)
    cli.call("Flush", uuid=ub)

    chunks = cli.call(
        "GenerateCSV", queryType=2, startTime=0, endTime=2**62,
        streams=[{"uuid": ua, "label": "A"}, {"uuid": ub, "label": "B"}],
    )
    assert all(len(c["batch"]) <= RESULTS_BATCH_SIZE for c in chunks)
    items = [r for c in chunks for r in c["batch"]]
    header, rows = items[0], items[1:]
    assert header["isHeader"] and header["row"] == [
        "Timestamp (ns)", "Human-Readable Time (UTC)", "A", "B"]
    assert len(rows) == 6000  # one row per distinct timestamp
    assert rows[0]["row"][0] == "0"
    assert rows[0]["row"][1].startswith("1970-01-01T00:00:00")
    assert rows[0]["row"][2] == "0.000000" and rows[0]["row"][3] == "0.000000"
    # odd-second rows: B has no point -> empty cell (csv.go writeEmptyPoint)
    assert rows[1]["row"][3] == "" and rows[1]["row"][2] == "1.000000"

    # windows mode: 1000s tumbling windows, quad columns per stream,
    # versioned header
    chunks = cli.call(
        "GenerateCSV", queryType=1, startTime=0, endTime=6000 * 10**9,
        windowSize=1000 * 10**9, includeVersions=True,
        streams=[{"uuid": ua, "label": "A"}, {"uuid": ub, "label": "B"}],
    )
    items = [r for c in chunks for r in c["batch"]]
    header, rows = items[0], items[1:]
    assert header["row"][:2] == ["Timestamp (ns)", "Human-Readable Time (UTC)"]
    assert header["row"][2] == "A, ver. 10 (Min)"
    assert header["row"][6] == "B, ver. 10 (Min)"
    assert len(rows) == 6  # 6 windows of 1000s
    r0 = rows[0]["row"]
    # A: 1000 pts values 0..999; B: 500 pts (every 2s) values 0..-499
    assert r0[2] == "0.000000" and r0[4] == "999.000000" and r0[5] == "1000"
    assert r0[6] == "-499.000000" and r0[8] == "0.000000" and r0[9] == "500"

    # aligned mode (queryType=0, pointWidth via depth) runs and pivots
    chunks = cli.call(
        "GenerateCSV", queryType=0, startTime=0, endTime=2**62, depth=40,
        streams=[{"uuid": ua, "label": "A"}],
    )
    items = [r for c in chunks for r in c["batch"]]
    assert items[0]["isHeader"] and len(items) > 1
    assert sum(int(r["row"][5]) for r in items[1:] if r["row"][5]) == 6000


def test_generate_csv_rpc_pinned_versions(served):
    """StreamCSVConfig.version: a stream pinned at an older version
    renders pre-delete data in the CSV while an unpinned sibling shows
    the live view — per-stream version filtering, not a global one."""
    _eng, cli = served
    ua = cli.call("Create", collection="csvv/a")[0]["uuid"]
    cli.call("Insert", uuid=ua, values=[(i * 10**9, float(i)) for i in range(10)])
    cli.call("Flush", uuid=ua)  # v10 holds times 0..9
    v_del = cli.call("DeleteRange", uuid=ua, start=0, end=5 * 10**9)[0][
        "versionMajor"
    ]
    assert v_del > 10

    def rows_at(streams):
        chunks = cli.call(
            "GenerateCSV", queryType=2, startTime=0, endTime=2**62,
            streams=streams,
        )
        items = [r for c in chunks for r in c["batch"]]
        return [r["row"] for r in items if not r["isHeader"]]

    live = rows_at([{"uuid": ua, "label": "A"}])
    assert len(live) == 5  # times 5..9 survive the delete
    pinned = rows_at([{"uuid": ua, "label": "A", "version": 10}])
    assert len(pinned) == 10  # the pre-delete snapshot
    assert pinned[0][0] == "0" and pinned[0][2] == "0.000000"


def test_generate_csv_rpc_duplicate_labels_and_empty_windows(served):
    """ADVICE r10 parity edges: serve.go allows DUPLICATE stream labels
    (columns are written positionally); an all-empty window writes every
    stream cell empty (csv.go writeEmptyPoint), not a count of 0."""
    _eng, cli = served
    ua = cli.call("Create", collection="csvd/a")[0]["uuid"]
    ub = cli.call("Create", collection="csvd/b")[0]["uuid"]
    cli.call("Insert", uuid=ua,
             values=[(i * 10**9, float(i)) for i in range(3)])
    # b's points live only in the FIRST 1000s window; later windows are
    # all-empty for both streams
    cli.call("Insert", uuid=ub, values=[(10**9, 7.0)])
    cli.call("Flush", uuid=ua)
    cli.call("Flush", uuid=ub)

    # duplicate label 'S' on both streams: header shows it twice, and the
    # value columns stay positional (a=0.0, b=7.0 at t=1s)
    chunks = cli.call(
        "GenerateCSV", queryType=2, startTime=0, endTime=2**62,
        streams=[{"uuid": ua, "label": "S"}, {"uuid": ub, "label": "S"}],
    )
    items = [r for c in chunks for r in c["batch"]]
    header, rows = items[0], items[1:]
    assert header["row"] == [
        "Timestamp (ns)", "Human-Readable Time (UTC)", "S", "S"]
    assert len(rows) == 3
    by_t = {r["row"][0]: r["row"] for r in rows}
    assert by_t["1000000000"][2] == "1.000000"
    assert by_t["1000000000"][3] == "7.000000"
    assert by_t["0"][3] == ""  # b absent at t=0

    # windows mode over 3 windows: window 2 (2000-3000s) is empty for
    # BOTH streams -> all eight stream cells empty
    chunks = cli.call(
        "GenerateCSV", queryType=1, startTime=0, endTime=3000 * 10**9,
        windowSize=1000 * 10**9,
        streams=[{"uuid": ua, "label": "S"}, {"uuid": ub, "label": "S"}],
    )
    items = [r for c in chunks for r in c["batch"]]
    rows = [r["row"] for r in items if not r["isHeader"]]
    assert len(rows) == 3
    empty = [r for r in rows if r[0] == str(2000 * 10**9)][0]
    assert empty[2:] == [""] * 8
    full = [r for r in rows if r[0] == "0"][0]
    assert full[5] == "3" and full[9] == "1"
