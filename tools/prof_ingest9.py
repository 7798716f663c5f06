"""Measure bulk_load after the payload-trim + dense-per-stream shape."""
import os, sys, tempfile, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F
from btrdb_spark.session import get_spark
from btrdb_spark.engine import BTrDBEngine

spark = get_spark("prof9", cpus=32)
spark.sparkContext.setLogLevel("ERROR")

n = 20_000_000
per_stream = n // 1024
pts = spark.range(n).select(
    (F.col("id") / per_stream).cast("long").cast("string").alias("uuid"),
    (F.lit(1704067200_000000000) + (F.col("id") % per_stream) * 1_000_000).alias("time"),
    (F.rand(42) * 100).alias("value"),
).cache()
pts.count()

with tempfile.TemporaryDirectory() as tmp:
    i = [0]

    def run(label, ladder, reps=4):
        best = float("inf")
        for _ in range(reps):
            i[0] += 1
            e = BTrDBEngine(spark, f"{tmp}/e{i[0]}", ladder=ladder)
            if ladder:
                e.ladder.levels = (30,)
            t0 = time.time()
            if ladder is False:
                e.bulk_load(pts)
            else:
                e.bulk_load(pts)
            best = min(best, time.time() - t0)
        print(f"{label}: best={best:.2f}s -> {n/best/1e6:.2f}M pts/s", flush=True)

    run("warm+total(ladder)", True)
    run("write only", False)
spark.stop()
