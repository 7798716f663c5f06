"""A/B: dict-off and one-wave repartition on the full bulk_load path."""
import os, sys, tempfile, time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F
from btrdb_spark.session import get_spark
from btrdb_spark.plans.rollup import RollupLadder, rollup_points

spark = get_spark("prof5", cpus=32)
spark.sparkContext.setLogLevel("ERROR")
n = 20_000_000
pts = spark.range(n).select(
    (F.col("id") % 1024).cast("string").alias("uuid"),
    (F.lit(1704067200_000000000) + F.col("id") * 1000).alias("time"),
    (F.rand(42) * 100).alias("value"),
).cache()
pts.count()
bucket = F.pmod(F.xxhash64(F.col("uuid")), F.lit(64))

def load(d, nparts, nodict):
    batch = (
        pts.withColumn("version", F.lit(10).cast("long"))
        .withColumn("uuid_bucket", bucket)
        .withColumn("time_bucket", F.shiftright(F.col("time"), 47))
    )
    w = (
        batch.repartition(nparts, F.col("uuid_bucket"))
        .sortWithinPartitions("uuid_bucket", "time_bucket", "uuid", "time")
        .write.mode("append")
    )
    if nodict:
        w = w.option("parquet.enable.dictionary", "false")
    w.partitionBy("uuid_bucket", "time_bucket").parquet(f"{d}/points")
    lad = RollupLadder(spark, f"{d}/rollups", levels=(30,))
    lad.ingest_batch(pts.withColumn("version", F.lit(10).cast("long")))

variants = {
    "cur_64_dict": (64, False),
    "64_nodict": (64, True),
    "32_dict": (32, False),
    "32_nodict": (32, True),
}
times = defaultdict(list)
with tempfile.TemporaryDirectory() as tmp:
    load(f"{tmp}/warm", 64, False)
    for rep in range(3):
        for name, (nparts, nodict) in variants.items():
            t0 = time.time()
            load(f"{tmp}/{name}_{rep}", nparts, nodict)
            times[name].append(round(time.time() - t0, 2))
for k, v in times.items():
    print(f"{k}: {v} min={min(v)} -> {n/min(v)/1e6:.2f}M pts/s", flush=True)
spark.stop()
