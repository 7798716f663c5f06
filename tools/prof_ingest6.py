"""Split-profile bulk_load: points-write vs ladder ingest vs total.

Mirrors bench.py's ingest probe (sf0.1 events table, ladder levels=(30,))
so numbers are directly comparable to BENCH ingest_commit_points_per_sec.
"""
import os, sys, tempfile, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F
from btrdb_spark.session import get_spark
from btrdb_spark.engine import BTrDBEngine

spark = get_spark("prof6", cpus=32)
spark.sparkContext.setLogLevel("ERROR")

n = int(os.environ.get("BTRDB_BENCH_POINTS", 20_000_000))
pts = spark.range(n).select(
    (F.col("id") % 1024).cast("string").alias("uuid"),
    (F.lit(1704067200_000000000) + F.col("id") * 1000).alias("time"),
    (F.rand(42) * 100).alias("value"),
).cache()
pts.count()
print(f"n={n}")


def run(label, fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    print(f"{label}: best={best:.2f}s -> {n/best/1e6:.2f}M pts/s", flush=True)
    return best


with tempfile.TemporaryDirectory() as tmp:
    i = [0]

    def mkeng(ladder):
        i[0] += 1
        e = BTrDBEngine(spark, f"{tmp}/e{i[0]}", ladder=ladder)
        if ladder:
            e.ladder.levels = (30,)
        return e

    # warm
    mkeng(True).bulk_load(pts)

    def total():
        mkeng(True).bulk_load(pts)

    def write_only():
        mkeng(False).bulk_load(pts)

    def ladder_only():
        e = mkeng(True)
        e.ladder.ingest_batch(pts.withColumn("version", F.lit(10).cast("long")))

    run("total bulk_load", total)
    run("points write only", write_only)
    run("ladder only", ladder_only)

spark.stop()
