"""Streaming KMV distinct sketch: bounded state, and the streamed fold
converges to the batch sketch over the same keys (the merge law live)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from btrdb_spark.functions import sketches
from btrdb_spark.streaming.sketch import streaming_distinct_kmv


def test_streaming_kmv_matches_batch_sketch(spark, tmp_path):
    # rate source: group = value % 2, key = value % 900 -> 450 distinct
    # keys per group once saturated; k=64 puts both groups in the
    # estimation regime
    k = 64
    src = (
        spark.readStream.format("rate").option("rowsPerSecond", "400").load()
        .select(
            (F.col("value") % 2).cast("string").alias("g"),
            (F.col("value") % 900).alias("u"),
        )
    )
    q = (
        streaming_distinct_kmv(src, "g", "u", k=k)
        .writeStream.format("memory")
        .queryName("skmv")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    seen_rows = 0
    try:
        deadline = time.time() + 45
        while time.time() < deadline:
            rows = spark.sql(
                "SELECT * FROM skmv ORDER BY group"
            ).collect()
            done = {
                r["group"]: r
                for r in rows
                if r["n_sketch"] == k
            }
            seen_rows = len(rows)
            if len(done) == 2:
                break
            time.sleep(1)
        q.processAllAvailable()
    finally:
        q.stop()
    # latest emission per group (update mode re-emits; memory sink appends
    # every update, so take the last row per group)
    latest = {}
    for r in spark.sql("SELECT * FROM skmv").collect():
        latest[r["group"]] = r
    assert set(latest) == {"0", "1"}
    # batch sketch over the SAME key sets: group 0 saw evens 0..898,
    # group 1 odds 1..899 — 450 distinct each
    batch_df = spark.range(900).select(
        (F.col("id") % 2).cast("string").alias("g"),
        (F.col("id") % 900).alias("u"),
    )
    batch = {
        r["g"]: r
        for r in sketches.distinct_kmv(batch_df, ["g"], "u", k=k).collect()
    }
    for g in ("0", "1"):
        s, b = latest[g], batch[g]
        assert s["n_sketch"] == min(k, int(b["n_exact"]))
        # streamed fold == batch sketch, bit-exact (the KMV merge law)
        if s["n_sketch"] == k:
            assert s["est_distinct"] == b["est_distinct"]
        # state is bounded at k regardless of how many rows streamed
        assert s["n_sketch"] <= k
    assert seen_rows >= 2  # update mode emitted along the way
