"""R8 ingest A/B: isolate WHERE the points-write time goes.

Variants (all shuffle+sort the same 20M rows):
  v0 current:        partitionBy(ub,tb) parquet append      <- production
  v1 nopart:         same plan, single output dir
  v2 committer_v2:   v0 + mapreduce committer algorithm v2
  v3 nodict:         v0 + parquet.enable.dictionary=false
  v4 noaqe:          v0 with AQE off for the job
Rounds are INTERLEAVED (v0..v4, v0..v4, ...) so box drift hits every
variant equally; report min + all reps.
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F

from btrdb_spark.engine import BTrDBEngine
from btrdb_spark.session import get_spark

spark = get_spark("prof_r8b", cpus=32)
spark.sparkContext.setLogLevel("ERROR")

n = 20_000_000
per_stream = n // 1024
pts = spark.range(n).select(
    (F.col("id") / per_stream).cast("long").cast("string").alias("uuid"),
    (F.lit(1704067200_000000000) + (F.col("id") % per_stream) * 10_000_000).alias("time"),
    (F.rand(42) * 100).alias("value"),
).cache()
pts.count()

tmp = tempfile.mkdtemp()
e = BTrDBEngine(spark, f"{tmp}/probe", ladder=False)
n_bins = max(e.n_uuid_buckets, 4 * spark.sparkContext.defaultParallelism)


def shaped():
    return (
        pts.select("uuid", "time", "value")
        .repartition(n_bins, e._ubucket(F.col("uuid")), e._tbucket(F.col("time")))
        .withColumn("version", F.lit(10).cast("long"))
        .withColumn("uuid_bucket", e._ubucket(F.col("uuid")))
        .withColumn("time_bucket", e._tbucket(F.col("time")))
        .sortWithinPartitions("uuid_bucket", "time_bucket", "uuid", "time")
    )


seq = [0]


def out():
    seq[0] += 1
    return f"{tmp}/out{seq[0]}"


def v0():
    shaped().write.mode("append").partitionBy("uuid_bucket", "time_bucket").parquet(out())


def v1():
    shaped().write.mode("append").parquet(out())


def v2():
    (
        shaped().write.mode("append")
        .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
        .partitionBy("uuid_bucket", "time_bucket").parquet(out())
    )


def v3():
    (
        shaped().write.mode("append")
        .option("parquet.enable.dictionary", "false")
        .partitionBy("uuid_bucket", "time_bucket").parquet(out())
    )


def v4():
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        v0()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


variants = [("v0 current", v0), ("v1 nopart", v1), ("v2 committerv2", v2),
            ("v3 nodict", v3), ("v4 noaqe", v4)]
times = {name: [] for name, _ in variants}
for rnd in range(4):
    for name, fn in variants:
        os.sync()
        time.sleep(1.5)
        t0 = time.time()
        fn()
        times[name].append(time.time() - t0)
for name, _ in variants:
    ts = times[name]
    print(f"{name}: min={min(ts):.2f}s -> {n/min(ts)/1e6:.2f}M pts/s reps={[round(t,2) for t in ts]}",
          flush=True)
spark.stop()
