"""Live CUSUM equals the fixed-target batch kernel on an in-order feed."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from btrdb_spark.operators.resample import cusum_alarms
from btrdb_spark.streaming.cusum import live_cusum


def test_live_cusum_matches_batch_fixed_target(spark, tmp_path):
    # rate source: stream u = value % 2; value pattern drives drift:
    # x = 10 when (value // 40) odd else 0 -> alternating 20-row regimes
    mu, k, h = 5.0, 2.0, 9.0
    src = (
        spark.readStream.format("rate").option("rowsPerSecond", "400").load()
        .select(
            (F.col("value") % 2).cast("string").alias("uuid"),
            F.col("value").alias("time"),
            F.when((F.floor(F.col("value") / 40) % 2) == 1, 10.0)
            .otherwise(0.0)
            .alias("value"),
        )
    )
    q = (
        live_cusum(src, mu=mu, k=k, h=h)
        .writeStream.format("memory")
        .queryName("live_cusum")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        deadline = time.time() + 45
        while time.time() < deadline:
            if spark.sql("SELECT COUNT(*) c FROM live_cusum").collect()[0]["c"] >= 8:
                break
            time.sleep(1)
        q.processAllAvailable()
    finally:
        q.stop()
    live = spark.sql("SELECT * FROM live_cusum").collect()
    assert live
    n = 2 * (max(r["time"] for r in live) + 1)  # rate delivered 0..n-1 at least
    # rebuild the SAME delivered prefix as a batch frame
    rows = [
        (str(i % 2), i, 10.0 if (i // 40) % 2 == 1 else 0.0, 10)
        for i in range(n)
    ]
    batch = spark.createDataFrame(
        rows, "uuid string, time long, value double, version long"
    )
    want = {
        (r["uuid"], r["time"], r["direction"], r["stat"])
        for r in cusum_alarms(batch, k=k, h=h, target=mu).collect()
    }
    got = {(r["uuid"], r["time"], r["direction"], r["stat"]) for r in live}
    # every live alarm is a batch alarm with the identical statistic
    assert got <= want
    assert len(got) >= 8
