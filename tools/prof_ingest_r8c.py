"""R8 ingest A/B round 2: full bulk_load variants, interleaved.

  f0 current:   overlapped points-write + ladder-from-batch
  f1 readback:  points-write, then ladder folded from the just-written
                (page-cache-hot, sorted) parquet
  f2 nocomp:    f0 with shuffle compression off (local page-cache disks)
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F

from btrdb_spark.engine import BTrDBEngine
from btrdb_spark.session import get_spark


def make(nocomp: bool):
    os.environ["BTRDB_SPARK_DRIVER_MEM"] = "48g"
    from pyspark.sql import SparkSession
    b = (
        SparkSession.builder.master("local[32]")
        .appName("prof_r8c")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "lz4")
    )
    if nocomp:
        b = b.config("spark.shuffle.compress", "false").config(
            "spark.shuffle.spill.compress", "false")
    return b.getOrCreate()


def run_phase(nocomp: bool, variants):
    spark = make(nocomp)
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
    seq = [0]
    out = {}

    def f_current():
        seq[0] += 1
        e = BTrDBEngine(spark, f"{tmp}/c{seq[0]}", ladder=True)
        e.ladder.levels = (30,)
        e.bulk_load(pts)

    def f_readback():
        seq[0] += 1
        e = BTrDBEngine(spark, f"{tmp}/r{seq[0]}", ladder=True)
        e.ladder.levels = (30,)
        # points only
        lad = e.ladder
        e.ladder = None
        try:
            e.bulk_load(pts)
        finally:
            e.ladder = lad
        cold = spark.read.parquet(e._append_dir("points"))
        lad.ingest_batch(cold.select("uuid", "time", "value", "version"))

    fns = {"current": f_current, "readback": f_readback}
    for rnd in range(4):
        for name in variants:
            os.sync()
            time.sleep(1.5)
            t0 = time.time()
            fns[name]()
            out.setdefault(name, []).append(time.time() - t0)
    for name, ts in out.items():
        tag = f"{name}{'(nocomp)' if nocomp else ''}"
        print(f"{tag}: min={min(ts):.2f}s -> {n/min(ts)/1e6:.2f}M pts/s reps={[round(t,2) for t in ts]}",
              flush=True)
    spark.stop()


run_phase(False, ["current", "readback"])
run_phase(True, ["current"])
