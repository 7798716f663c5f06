"""Compare parquet codecs on the bulk_load commit path (20M points)."""
import os, sys, tempfile, time
sys.path.insert(0, '/root/repo')
from pyspark.sql import functions as F
from btrdb_spark.session import get_spark
from btrdb_spark.engine import BTrDBEngine

spark = get_spark("prof_codec", cpus=32)
spark.sparkContext.setLogLevel("ERROR")
n = 20_000_000
per_stream = n // 1024
pts = spark.range(n).select(
    (F.col("id") / per_stream).cast("long").cast("string").alias("uuid"),
    (F.lit(1704067200_000000000) + (F.col("id") % per_stream) * 1_000_000).alias("time"),
    (F.rand(42) * 100).alias("value"),
).cache()
pts.count()
for codec in ("lz4", "uncompressed", "zstd", "snappy"):
    spark.conf.set("spark.sql.parquet.compression.codec", codec)
    best = float("inf"); size = 0
    for i in range(3):
        os.sync(); time.sleep(1)
        with tempfile.TemporaryDirectory() as tmp:
            e = BTrDBEngine(spark, tmp, ladder=False)
            t0 = time.time()
            e.bulk_load(pts)
            best = min(best, time.time() - t0)
            size = sum(os.path.getsize(os.path.join(r, f)) for r, _, fs in os.walk(tmp) for f in fs)
    print(f"{codec}: best={best:.2f}s -> {n/best/1e6:.2f}M pts/s, {size/1e6:.0f} MB", flush=True)
spark.stop()
