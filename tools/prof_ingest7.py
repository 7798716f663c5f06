"""A/B the bucket->partition routing on the points-write path.

Hypothesis: repartition(64, uuid_bucket) re-hashes 64 distinct bucket ids
into 64 slots (murmur3 % 64) -> ~1/e of slots empty, others stacked 2-3
deep -> write bounded by straggler tasks at 2-3x the mean. A salt column
chosen so murmur3(salt) % 64 is a *permutation* routes each bucket to its
own partition exactly.
"""
import os, sys, tempfile, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F
from btrdb_spark.session import get_spark

spark = get_spark("prof7", cpus=32)
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

# find salts: murmur3(int salt) % NB covers each partition exactly once
rows = (
    spark.range(100_000)
    .select(F.col("id").cast("int").alias("s"), F.pmod(F.hash(F.col("id").cast("int")), F.lit(NB)).alias("p"))
    .collect()
)
salt_for = {}
for r in rows:
    if r.p not in salt_for:
        salt_for[r.p] = r.s
    if len(salt_for) == NB:
        break
assert len(salt_for) == NB
# skew check of the current scheme: how many buckets land in each slot
from collections import Counter

cur = Counter()
for r in rows[:NB]:  # salt==bucket id 0..63 is exactly the current routing
    cur[r.p] += 1
print("current routing: empty slots =", NB - len(cur), " max stack =", max(cur.values()))

salt_arr = F.array(*[F.lit(salt_for[b]) for b in range(NB)])


def write(d, routed):
    batch = pts.withColumn("uuid_bucket", bucket).withColumn(
        "time_bucket", F.shiftright(F.col("time"), 47)
    )
    if routed:
        batch = batch.withColumn(
            "_route", F.element_at(salt_arr, F.col("uuid_bucket").cast("int") + 1)
        )
        part = batch.repartition(NB, F.col("_route")).drop("_route")
    else:
        part = batch.repartition(NB, F.col("uuid_bucket"))
    (
        part.sortWithinPartitions("uuid_bucket", "time_bucket", "uuid", "time")
        .write.mode("append")
        .partitionBy("uuid_bucket", "time_bucket")
        .parquet(d)
    )


times = {}
with tempfile.TemporaryDirectory() as tmp:
    write(f"{tmp}/warm", False)
    for rep in range(3):
        for name, routed in [("hash64", False), ("routed", True)]:
            t0 = time.time()
            write(f"{tmp}/{name}{rep}", routed)
            dt = time.time() - t0
            times.setdefault(name, []).append(round(dt, 2))
for k, v in times.items():
    print(f"{k}: {v} min={min(v)} -> {n/min(v)/1e6:.2f}M pts/s", flush=True)
spark.stop()
