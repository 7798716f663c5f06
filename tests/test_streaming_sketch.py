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


def test_streaming_hll_matches_batch_sketch(spark, tmp_path):
    """r6 verdict #5: the streamed HLL fold (register-wise max) equals
    sketches.distinct_hll over the union of all micro-batches — same
    registers, bit-identical estimate. File source with one file per
    trigger forces a genuine multi-batch fold."""
    from btrdb_spark.streaming.sketch import streaming_distinct_hll

    b = 9
    rows = spark.range(1200).select(
        (F.col("id") % 2).cast("string").alias("g"),
        (F.col("id") % 700).alias("u"),
    )
    batch = {
        r["g"]: r for r in sketches.distinct_hll(rows, ["g"], "u", b=b).collect()
    }
    src_dir = tmp_path / "hll_src"
    # two waves -> at least two micro-batches fold into the state
    rows.filter(F.col("id") < 600).write.parquet(str(src_dir / "w1.parquet"))
    rows.filter(F.col("id") >= 600).write.parquet(str(src_dir / "w2.parquet"))
    src = (
        spark.readStream.schema("g string, u long")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src_dir) + "/*.parquet")
    )
    q = (
        streaming_distinct_hll(src, "g", "u", b=b)
        .writeStream.format("memory")
        .queryName("shll")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "hll_ckpt"))
        .start()
    )
    latest: dict = {}
    try:
        deadline = time.time() + 90
        while time.time() < deadline:
            for r in spark.sql("SELECT * FROM shll").collect():
                latest[r["group"]] = r
            if set(latest) == {"0", "1"} and all(
                latest[g]["est_hll"] == batch[g]["est_hll"] for g in ("0", "1")
            ):
                break
            time.sleep(1)
    finally:
        q.stop()
    for g in ("0", "1"):
        assert latest[g]["est_hll"] == batch[g]["est_hll"]
        assert latest[g]["zero_registers"] == batch[g]["zero_registers"]


def test_streaming_cms_matches_batch_heavy_hitters(spark, tmp_path):
    """r6 verdict #5: streamed CMS cells fold by cell-wise add, so once
    every file is consumed the per-token estimates — and the top-k — are
    bit-identical to sketches.cms_heavy_hitters over the same corpus
    (vocab kept inside cand_cap so the candidate pool is exhaustive)."""
    from btrdb_spark.streaming.sketch import streaming_cms_topk

    docs = spark.range(200).select(
        F.lit("0").alias("g"),
        F.concat(
            F.when(F.col("id") % 2 == 0, F.lit("hot ")).otherwise(F.lit("")),
            F.lit("w"), (F.col("id") % 23).cast("string"),
            F.lit(" common"),
        ).alias("text"),
    )
    want = [
        (r["token"], r["est_count"])
        for r in sketches.cms_heavy_hitters(docs, topk=10).collect()
    ]
    src_dir = tmp_path / "cms_src"
    docs.filter(F.col("id") < 100).write.parquet(str(src_dir / "w1.parquet"))
    docs.filter(F.col("id") >= 100).write.parquet(str(src_dir / "w2.parquet"))
    src = (
        spark.readStream.schema("g string, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src_dir) + "/*.parquet")
    )
    q = (
        streaming_cms_topk(src, "g", "text", topk=10)
        .writeStream.format("memory")
        .queryName("scms")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "cms_ckpt"))
        .start()
    )
    got: list = []
    try:
        deadline = time.time() + 90
        while time.time() < deadline:
            rows = spark.sql(
                "SELECT * FROM scms ORDER BY est_count DESC, token ASC"
            ).collect()
            # memory sink appends every update; reconstruct the LAST
            # emission per token and take the top 10
            last: dict = {}
            for r in rows:
                last[r["token"]] = max(last.get(r["token"], 0), r["est_count"])
            got = sorted(last.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
            if got == want:
                break
            time.sleep(1)
    finally:
        q.stop()
    assert got == want
