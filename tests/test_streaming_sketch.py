"""Streaming KMV distinct sketch: bounded state, and the streamed fold
converges to the batch sketch over the same keys (the merge law live)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from btrdb_spark.functions import sketches
from btrdb_spark.streaming.sketch import streaming_distinct_kmv


def test_streaming_kmv_matches_batch_sketch(spark, tmp_path):
    # rate source: group = value % 2, key = value % 900 -> 450 distinct
    # keys per group once SATURATED (value >= 900); k=64 puts both
    # groups in the estimation regime. The poll waits for full
    # saturation (streamed estimate == batch estimate), not merely for
    # the sketch to fill — the sketch holds 64 hashes long before all
    # 900 residues have streamed, and an early snapshot is a DIFFERENT
    # (smaller) key set with a legitimately different bottom-64.
    k = 64
    batch_df = spark.range(900).select(
        (F.col("id") % 2).cast("string").alias("g"),
        (F.col("id") % 900).alias("u"),
    )
    batch = {
        r["g"]: r
        for r in sketches.distinct_kmv(batch_df, ["g"], "u", k=k).collect()
    }
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
    latest: dict = {}
    emissions = 0
    try:
        deadline = time.time() + 90
        while time.time() < deadline:
            rows = spark.sql("SELECT * FROM skmv").collect()
            emissions = len(rows)
            latest = {}
            for r in rows:  # memory sink appends every update; last wins
                latest[r["group"]] = r
            if set(latest) == {"0", "1"} and all(
                latest[g]["est_distinct"] == batch[g]["est_distinct"]
                for g in ("0", "1")
            ):
                break
            time.sleep(1)
    finally:
        q.stop()
    assert set(latest) == {"0", "1"}
    for g in ("0", "1"):
        s, b = latest[g], batch[g]
        # streamed fold == batch sketch over the same 450 keys, bit-exact
        # (the KMV merge law); state stayed bounded at k throughout
        assert s["est_distinct"] == b["est_distinct"]
        assert s["n_sketch"] == min(k, int(b["n_exact"])) == k
    assert emissions >= 2  # update mode re-emitted along the way
