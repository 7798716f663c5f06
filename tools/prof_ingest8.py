"""Decompose the points-write cost: shuffle | sort | encode | dyn-partition."""
import os, sys, tempfile, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F
from btrdb_spark.session import get_spark

spark = get_spark("prof8", cpus=32)
spark.sparkContext.setLogLevel("ERROR")

n = 20_000_000
pts = spark.range(n).select(
    (F.col("id") % 1024).cast("string").alias("uuid"),
    (F.lit(1704067200_000000000) + F.col("id") * 1000).alias("time"),
    (F.rand(42) * 100).alias("value"),
    F.lit(10).cast("long").alias("version"),
).cache()
pts.count()

NB = 64
bucket = F.pmod(F.xxhash64(F.col("uuid")), F.lit(NB))
base = pts.withColumn("uuid_bucket", bucket).withColumn(
    "time_bucket", F.shiftright(F.col("time"), 47)
)
part = base.repartition(NB, F.col("uuid_bucket"))
sorted_part = part.sortWithinPartitions("uuid_bucket", "time_bucket", "uuid", "time")

cases = {
    "shuffle+noop": lambda d: part.write.format("noop").mode("overwrite").save(),
    "shuffle+sort+noop": lambda d: sorted_part.write.format("noop").mode("overwrite").save(),
    "full (sort+dynpart parquet)": lambda d: sorted_part.write.mode("append")
    .partitionBy("uuid_bucket", "time_bucket")
    .parquet(d),
    "nosort dynpart parquet": lambda d: part.write.mode("append")
    .partitionBy("uuid_bucket", "time_bucket")
    .parquet(d),
    "sorted flat parquet": lambda d: sorted_part.write.mode("append").parquet(d),
}

times = {}
with tempfile.TemporaryDirectory() as tmp:
    sorted_part.write.mode("append").partitionBy("uuid_bucket", "time_bucket").parquet(
        f"{tmp}/warm"
    )
    for rep in range(3):
        for name, fn in cases.items():
            t0 = time.time()
            fn(f"{tmp}/{name.split()[0]}{rep}")
            times.setdefault(name, []).append(round(time.time() - t0, 2))
for k, v in times.items():
    print(f"{k}: {v} min={min(v)} -> {n/min(v)/1e6:.2f}M pts/s", flush=True)
spark.stop()
