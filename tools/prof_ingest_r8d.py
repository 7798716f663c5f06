"""One-process full-bulk_load probe; arg1 = 'comp' | 'nocomp'.
Prints min + reps over 4 reps with sync+settle between."""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F, SparkSession

mode = sys.argv[1]
b = (
    SparkSession.builder.master("local[32]")
    .appName(f"prof_r8d_{mode}")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.driver.memory", "48g")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.parquet.compression.codec", "lz4")
)
if mode == "nocomp":
    b = b.config("spark.shuffle.compress", "false").config(
        "spark.shuffle.spill.compress", "false")
spark = b.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

from btrdb_spark.engine import BTrDBEngine

n = 20_000_000
per_stream = n // 1024
pts = spark.range(n).select(
    (F.col("id") / per_stream).cast("long").cast("string").alias("uuid"),
    (F.lit(1704067200_000000000) + (F.col("id") % per_stream) * 10_000_000).alias("time"),
    (F.rand(42) * 100).alias("value"),
).cache()
pts.count()
tmp = tempfile.mkdtemp()
ts = []
for i in range(4):
    os.sync()
    time.sleep(3)
    e = BTrDBEngine(spark, f"{tmp}/e{i}", ladder=True)
    e.ladder.levels = (30,)
    t0 = time.time()
    e.bulk_load(pts)
    ts.append(time.time() - t0)
print(f"RESULT {mode}: min={min(ts):.2f}s -> {n/min(ts)/1e6:.2f}M pts/s reps={[round(t,2) for t in ts]}",
      flush=True)
spark.stop()
