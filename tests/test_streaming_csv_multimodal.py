"""Streaming ingest (S2 analog), CSV sink (S6), multimodal plumbing, simhash."""

from __future__ import annotations

import glob
import time

import pytest
from pyspark.sql import functions as F

from btrdb_spark.engine import BTrDBEngine
from btrdb_spark.functions import dedup, multimodal
from btrdb_spark.operators.csv import csv_raw, csv_windows, csv_windows_arb, write_csv
from btrdb_spark.streaming.ingest import attach_ingest


def test_streaming_ingest_foreachbatch(spark, tmp_path):
    eng = BTrDBEngine(spark, str(tmp_path / "db"), flush_threshold=10**9)
    u = eng.create_stream("stream/a", uuid="su1")
    src = (
        spark.readStream.format("rate").option("rowsPerSecond", "50").load()
        .select(
            F.lit("su1").alias("uuid"),
            (F.col("value") * 1000).alias("time"),
            F.col("value").cast("double").alias("value"),
        )
    )
    q = attach_ingest(src, eng, str(tmp_path / "ckpt"))
    try:
        deadline = time.time() + 30
        while time.time() < deadline and eng.hot.count() == 0:
            time.sleep(1)
    finally:
        q.stop()
    n = eng.hot.count()
    assert n > 0                       # buffered rows visible
    maj, mino = eng.stream_version(u)
    assert (maj, mino) == (9, n)       # minor = buffered count
    latest = eng.raw_values(u, 0, 10**12).count()
    assert latest == n                 # merge-on-read sees the buffer
    maj, _ = eng.flush(u)
    assert maj == 10


def test_csv_raw_mode(make_points, tmp_path, spark):
    pts = make_points([("x", 1_000_000_000, 1.5, 10), ("y", 1_000_000_000, 2.5, 10), ("y", 2_000_000_000, 3.5, 10)])
    df = csv_raw(pts, ["x", "y"], 0, 10**10, labels=["meter_x", "meter_y"])
    rows = df.orderBy("time").collect()
    assert df.columns == ["time", "time_rfc3339", "meter_x", "meter_y"]
    assert (rows[0]["meter_x"], rows[0]["meter_y"]) == (1.5, 2.5)
    assert rows[1]["meter_x"] is None and rows[1]["meter_y"] == 3.5
    assert rows[0]["time_rfc3339"].startswith("1970-01-01T00:00:01")
    out = str(tmp_path / "csv_out")
    write_csv(df, out)
    assert glob.glob(f"{out}/*.csv")


def test_csv_windows_mode(make_points):
    pts = make_points([("x", 1, 1.0, 10), ("x", 2, 3.0, 10), ("y", 9, 5.0, 10)])
    df = csv_windows(pts, ["x", "y"], 0, 16, pw=3)
    rows = df.collect()
    assert rows[0]["time"] == 0 and rows[0]["x_mean"] == 2.0 and rows[0]["x_count"] == 2
    assert rows[1]["time"] == 8 and rows[1]["y_min"] == 5.0 and rows[1]["x_count"] is None


def test_resize_plumbing(spark):
    rows = [
        (1, "image", bytearray(b"imgbytes"), 64, 64, None),
        (2, "audio", bytearray(b"audiobytes"), None, None, 2000),  # pruned: not image
        (3, "image", None, None, None, None),  # null blob -> null payload
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in multimodal.resize(media, 32, 32).collect()}
    assert set(out) == {1, 3}
    assert out[1]["out_width"] == 32 and len(out[1]["resized"]) == 32 * 32 // 256 + 16
    assert out[3]["resized"] is None and out[3]["out_width"] is None
    # deterministic: same blob + dims -> same payload
    again = {r["media_id"]: r for r in multimodal.resize(media, 32, 32).collect()}
    assert bytes(again[1]["resized"]) == bytes(out[1]["resized"])


def test_csv_windows_arb_mode(make_points):
    # Arbitrary width 5 anchored at 0; end 17 rounds down to 15 (3 windows).
    # Stream x is active across the range, so its empty middle window
    # surfaces as count=0 with NULL stats; y only has data in window 0.
    pts = make_points([("x", 1, 1.0, 10), ("x", 12, 3.0, 10), ("y", 2, 5.0, 10)])
    df = csv_windows_arb(pts, ["x", "y"], 0, 17, width=5)
    rows = df.collect()
    assert [r["time"] for r in rows] == [0, 5, 10]
    assert rows[0]["x_mean"] == 1.0 and rows[0]["y_count"] == 1
    assert rows[1]["x_count"] == 0 and rows[1]["x_min"] is None
    assert rows[1]["y_count"] == 0
    assert rows[2]["x_max"] == 3.0 and rows[2]["y_count"] == 0


def test_multimodal_feature_extraction(spark):
    rows = [
        (1, "image", bytearray(b"imgbytes"), 64, 64, None),
        (2, "audio", bytearray(b"audiobytes"), None, None, 2000),
        (3, "image", None, None, None, None),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = multimodal.extract_features(media).collect()
    by_id = {r["media_id"]: r for r in out}
    assert by_id[1]["feat_dim"] == 8 and len(by_id[1]["feature"]) == 8
    assert all(0.0 <= v <= 1.0 for v in by_id[1]["feature"])
    assert by_id[3]["feature"] is None
    # determinism
    out2 = multimodal.extract_features(media).collect()
    assert {r["media_id"]: r["feature"] for r in out2} == {r["media_id"]: r["feature"] for r in out}


def test_frame_sample_plan(spark):
    rows = [(1, "video", None, None, None, 3500), (2, "image", None, None, None, None)]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    frames = multimodal.frame_sample_plan(media, every_ms=1000).collect()
    assert [(r["media_id"], r["frame_ts_ms"]) for r in frames] == [(1, 0), (1, 1000), (1, 2000), (1, 3000)]


def test_simhash_near_dups(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps over the lazy dog tonight"),
        (3, "spark shuffles partition data across many executors fast"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = {r["doc_id"]: r["simhash"] for r in dedup.simhash_signatures(docs).collect()}
    assert bin(sigs[1] ^ sigs[2]).count("1") < bin(sigs[1] ^ sigs[3]).count("1")
    pairs = dedup.simhash_pairs(docs, max_hamming=4).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in pairs} == {(1, 2)}


def test_live_stat_view_stateful(spark, tmp_path):
    """applyInPandasWithState live view: per-bucket stats accumulate across
    micro-batches and converge to the batch-path answer."""
    import pandas as pd

    from btrdb_spark.operators.windows import aligned_windows
    from btrdb_spark.streaming.live import live_stat_view

    src = (
        spark.readStream.format("rate").option("rowsPerSecond", "500").load()
        .select(
            (F.col("value") % 2).cast("string").alias("uuid"),
            (F.col("value") * (1 << 18)).alias("time"),   # 4 buckets at pw=20 per 16 rows
            (F.col("value") % 100).cast("double").alias("value"),
        )
    )
    q = (
        live_stat_view(src, pw=20)
        .writeStream.format("memory")
        .queryName("live_stats")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "lsckpt"))
        .start()
    )
    try:
        deadline = time.time() + 40
        while time.time() < deadline:
            if spark.sql("SELECT COUNT(*) c FROM live_stats").collect()[0]["c"] >= 4:
                break
            time.sleep(1)
        q.processAllAvailable()
    finally:
        q.stop()
    live = spark.sql(
        """SELECT uuid, bucket_start, MAX_BY(cnt, cnt) cnt, MAX_BY(vmin, cnt) vmin,
                  MAX_BY(vmean, cnt) vmean, MAX_BY(vmax, cnt) vmax
           FROM live_stats GROUP BY 1, 2"""
    ).toPandas()
    assert len(live) >= 4
    # rebuild the same input as a batch and compare the latest live rows
    n = int(live["cnt"].sum())
    rows = [((i % 2), i * (1 << 18), float(i % 100)) for i in range(10**6)]
    # rate source delivers value = 0..n-1 in order, so the first n rows
    # reconstruct the delivered input exactly
    batch = spark.createDataFrame(
        [(str(u), t, v, 10) for (u, t, v) in rows[:n]],
        "uuid string, time long, value double, version long",
    )
    want = {
        (r["uuid"], r["bucket_start"]): (r["cnt"], r["vmin"], r["vmax"])
        for r in aligned_windows(batch, None, 0, 1 << 62, 20).collect()
    }
    got = {
        (r["uuid"], int(r["bucket_start"])): (int(r["cnt"]), r["vmin"], r["vmax"])
        for _, r in live.iterrows()
    }
    # every fully-delivered bucket matches the batch answer
    matching = sum(1 for k, v in got.items() if want.get(k) == v)
    assert matching >= len(got) - 2  # at most the two in-flight buckets differ


def _run_event_time_sessions(spark, tmp_path, tag):
    from btrdb_spark.streaming.sessions import live_sessions_event_time

    src = (
        spark.readStream.schema("uuid string, time long, value double")
        .parquet(str(tmp_path / "sessdata"))
    )
    name = f"ev_sessions_{tag}"
    q = (
        live_sessions_event_time(src, gap=100)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{tag}"))
        .start()
    )
    try:
        q.processAllAvailable()
        # one more cycle so the watermark computed at the end of the data
        # batch gets applied and fires the event-time timeouts
        deadline = time.time() + 30
        while time.time() < deadline:
            n = spark.sql(f"SELECT COUNT(*) c FROM {name}").collect()[0]["c"]
            if n >= 5:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    return {
        (r["uuid"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql(f"SELECT * FROM {name}").collect()
        if r["uuid"] != "zz"
    }


def test_event_time_sessions_match_batch_and_replay(spark, tmp_path):
    """Event-time sessionizer: closed sessions equal the batch
    gaps-and-islands answer, and a full replay emits the identical set
    (no wall-clock dependence), unlike the processing-time idle close."""
    rows = (
        [("u1", t, 1.0) for t in (0, 50, 70, 10_000, 10_020, 50_000)]
        + [("u2", t, 1.0) for t in (5, 200, 220)]
        + [("zz", 10**12, 1.0)]  # sentinel advances the global watermark
    )
    spark.createDataFrame(rows, "uuid string, time long, value double").coalesce(
        1
    ).write.parquet(str(tmp_path / "sessdata"))

    expected = {
        ("u1", 0, 70, 3),
        ("u1", 10_000, 10_020, 2),
        ("u1", 50_000, 50_000, 1),
        ("u2", 5, 5, 1),
        ("u2", 200, 220, 2),
    }
    got1 = _run_event_time_sessions(spark, tmp_path, "a")
    assert got1 == expected
    # replay from a fresh checkpoint: byte-identical session set
    got2 = _run_event_time_sessions(spark, tmp_path, "b")
    assert got2 == got1


def test_live_sessions_gap_close(spark, tmp_path):
    """Streaming sessionizer closes a session when the time gap exceeds
    `gap`, and the closed rows match the batch gaps-and-islands answer."""
    from btrdb_spark.streaming.sessions import live_sessions

    src = (
        spark.readStream.format("rate").option("rowsPerSecond", "200").load()
        .select(
            F.lit("u1").alias("uuid"),
            # value = 0,1,2,... -> bursts of 5 close together, then a jump
            # 100x the gap: sessions of exactly 5 events each
            ((F.col("value") % 5) * 10 + (F.col("value") / F.lit(5)).cast("long") * 10_000).alias("time"),
            F.col("value").cast("double").alias("value"),
        )
    )
    q = (
        live_sessions(src, gap=100, idle_close_ms=5_000)
        .writeStream.format("memory")
        .queryName("live_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "sessckpt"))
        .start()
    )
    try:
        # no processAllAvailable: the rate source never drains, it would
        # chase its tail — poll the sink until enough sessions closed
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.sql("SELECT COUNT(*) c FROM live_sessions").collect()[0]["c"] >= 3:
                break
            time.sleep(1)
    finally:
        q.stop()
    rows = spark.sql(
        "SELECT * FROM live_sessions ORDER BY session_start"
    ).collect()
    assert len(rows) >= 3
    for r in rows:
        # every gap-closed session is a full burst: 5 events spanning 40ns
        if r["closed_by"] == "gap":
            assert r["n_events"] == 5
            assert r["session_end"] - r["session_start"] == 40


def _run_live_ewma(spark, tmp_path, tag):
    from btrdb_spark.streaming.ewma import live_ewma

    src = (
        spark.readStream.schema("uuid string, time long, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(tmp_path / "ewmadata"))
    )
    name = f"live_ewma_{tag}"
    q = (
        live_ewma(src, alpha=0.25)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ewma_ckpt_{tag}"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return {
        (r["uuid"], r["time"], r["value"], r["ewma"])
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }


def test_live_ewma_matches_batch_and_replays(spark, tmp_path):
    """Stateful streaming EWMA: with per-stream in-order arrival the live
    rows equal the batch recurrence bit-for-bit (state carried across
    micro-batches), and a fresh-checkpoint replay is identical."""
    import time as _t

    from btrdb_spark.operators.resample import ewma as batch_ewma

    d = tmp_path / "ewmadata"
    d.mkdir()
    rows1 = [("u1", t, float(t % 7)) for t in range(0, 50)] + [("u2", t, 3.0 + t) for t in range(0, 20)]
    rows2 = [("u1", t, float(t % 5)) for t in range(50, 90)] + [("u2", t, 1.0) for t in range(20, 40)]
    spark.createDataFrame(rows1, "uuid string, time long, value double").coalesce(1).write.mode("append").parquet(str(d))
    _t.sleep(1.1)  # distinct mtimes: file order == time order
    spark.createDataFrame(rows2, "uuid string, time long, value double").coalesce(1).write.mode("append").parquet(str(d))

    want = {
        (r["uuid"], r["time"], r["value"], r["ewma"])
        for r in batch_ewma(
            spark.createDataFrame(rows1 + rows2, "uuid string, time long, value double"),
            alpha=0.25,
        ).collect()
    }
    got1 = _run_live_ewma(spark, tmp_path, "a")
    assert got1 == want
    got2 = _run_live_ewma(spark, tmp_path, "b")
    assert got2 == got1
