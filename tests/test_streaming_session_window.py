"""Native session_window, stateful (verdict r7 ask #5): the identical
session aggregation that serves the batch `session_window_stats` oracle
row runs as a watermarked streaming query, and the closed sessions it
appends are row-equal to the batch answer over the same events."""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from btrdb_spark.functions import analytics
from btrdb_spark.streaming.sessions import streaming_session_window_stats

GAP = 60_000_000_000  # 60 s in ns
BASE = 1_700_000_000_000_000_000  # epoch ns, µs-aligned


def _write_file(path, rows):
    tbl = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "time_ns": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "value": pa.array([float(r[3]) for r in rows], pa.float64()),
        }
    )
    pq.write_table(tbl, path)


def test_streaming_session_window_matches_batch(spark, tmp_path):
    # two users, three sessions each, values chosen so means are exact;
    # event times ascend across files so the watermark closes sessions
    # as the stream progresses
    sessions = [
        (1, BASE, [("a", 1.0), ("b", 2.0), ("a", 3.0)]),
        (2, BASE + 5_000_000_000, [("c", 10.0)]),
        (1, BASE + 300_000_000_000, [("a", 4.0), ("a", 6.0)]),
        (2, BASE + 330_000_000_000, [("b", 7.0), ("c", 8.0), ("c", 9.0)]),
        (1, BASE + 700_000_000_000, [("b", 5.0)]),
        (2, BASE + 730_000_000_000, [("a", 1.5), ("b", 2.5)]),
    ]
    rows = []
    for user, start, evs in sessions:
        for i, (et, v) in enumerate(evs):
            rows.append((user, start + i * 1_000_000_000, et, v))
    rows.sort(key=lambda r: r[1])
    # sentinel: far-future event whose own (still-open) session is
    # excluded from the comparison; it pushes the watermark past every
    # real session's close so append mode emits them all
    sentinel = (99, BASE + 10_000_000_000_000, "z", 0.0)

    src_dir = tmp_path / "events_stream"
    src_dir.mkdir()
    thirds = [rows[:3], rows[3:8], rows[8:] + [sentinel]]
    for i, chunk in enumerate(thirds):
        p = str(src_dir / f"b{i}.parquet")
        _write_file(p, chunk)
        os.utime(p, (time.time() + i, time.time() + i))

    batch_df = spark.createDataFrame(
        rows, "user_id long, time_ns long, event_type string, value double"
    )
    want = [
        (r["user_id"], r["session_start_ns"], r["n_events"], r["n_types"],
         r["mean_value"])
        for r in analytics.session_window_stats(batch_df, gap_ns=GAP).collect()
    ]
    assert len(want) == 6

    stream = (
        spark.readStream.schema(
            "user_id long, time_ns long, event_type string, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir))
    )
    q = (
        streaming_session_window_stats(stream, gap_ns=GAP)
        .writeStream.format("memory")
        .queryName("ssw")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = [
            (r["user_id"], r["session_start_ns"], r["n_events"], r["n_types"],
             r["mean_value"])
            for r in spark.sql(
                "SELECT * FROM ssw WHERE user_id != 99"
            ).collect()
        ]
    finally:
        q.stop()
    assert sorted(got) == sorted(want)


def test_streaming_session_window_append_emits_once(spark, tmp_path):
    """Each closed session appears exactly once across ALL micro-batches
    (append-mode finality), and the still-open final session is absent."""
    rows = [(1, BASE + i * 1_000_000_000, "a", 1.0) for i in range(3)]
    late = [(1, BASE + 500_000_000_000, "a", 2.0)]
    src_dir = tmp_path / "ev2"
    src_dir.mkdir()
    for i, chunk in enumerate([rows, late]):
        p = str(src_dir / f"b{i}.parquet")
        _write_file(p, chunk)
        os.utime(p, (time.time() + i, time.time() + i))
    stream = (
        spark.readStream.schema(
            "user_id long, time_ns long, event_type string, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir))
    )
    q = (
        streaming_session_window_stats(stream, gap_ns=GAP)
        .writeStream.format("memory")
        .queryName("ssw2")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT * FROM ssw2").collect()
    finally:
        q.stop()
    assert len(got) == 1  # the first session, exactly once
    assert got[0]["n_events"] == 3 and got[0]["session_start_ns"] == BASE
