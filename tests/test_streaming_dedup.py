"""Streaming first-seen exact dedup: one keeper per distinct content
across micro-batches, duplicates dropped forever."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from btrdb_spark.streaming.dedup import streaming_dedup_exact


def test_streaming_dedup_first_seen(spark, tmp_path):
    # rate source: value i maps to text "t<i % 7>" -> only 7 distinct docs
    src = (
        spark.readStream.format("rate").option("rowsPerSecond", "200").load()
        .select(
            F.col("value").alias("doc_id"),
            F.concat(F.lit("t"), (F.col("value") % 7).cast("string")).alias("text"),
        )
    )
    q = (
        streaming_dedup_exact(src)
        .writeStream.format("memory")
        .queryName("sdedup")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        deadline = time.time() + 40
        while time.time() < deadline:
            if spark.sql("SELECT COUNT(*) c FROM sdedup").collect()[0]["c"] >= 7:
                break
            time.sleep(1)
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM sdedup").collect()
    # exactly one keeper per distinct content, never a duplicate emission
    assert len(rows) == 7
    assert len({r["content_hash"] for r in rows}) == 7
    # keepers are the first-arrived ids: rate delivers 0,1,2,... in order,
    # so the keeper for content i%7 == i is i itself (ids 0..6)
    assert sorted(r["doc_id"] for r in rows) == list(range(7))
