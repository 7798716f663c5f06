"""r11 ingest-floor bisect: the settled-box write-only leg fell from
10-12M pts/s (r8/r9) to ~5M pts/s on byte-identical code -> storage got
slower. A/B config levers that cut bytes-to-disk / move transient IO off
the contended device. Each variant runs in a fresh JVM (local.dir is
boot-time), write-only bulk_load, best of 3."""
import os, shutil, subprocess, sys, tempfile, time

VARIANTS = {
    "A_base": {},
    "B_shm_localdir": {"spark.local.dir": "/dev/shm/sparktmp"},
    "C_shm_zstd": {
        "spark.local.dir": "/dev/shm/sparktmp",
        "spark.sql.parquet.compression.codec": "zstd",
    },
    "D_shm_pv2": {
        "spark.local.dir": "/dev/shm/sparktmp",
        "spark.hadoop.parquet.writer.version": "v2",
    },
    "E_shm_zstd_pv2": {
        "spark.local.dir": "/dev/shm/sparktmp",
        "spark.sql.parquet.compression.codec": "zstd",
        "spark.hadoop.parquet.writer.version": "v2",
    },
}


def run_variant(name):
    import pyspark
    from pyspark.sql import functions as F

    sys.path.insert(0, "/root/repo")
    from btrdb_spark.session import get_spark
    from btrdb_spark.engine import BTrDBEngine
    from pyspark.sql import SparkSession

    confs = VARIANTS[name]
    os.makedirs("/dev/shm/sparktmp", exist_ok=True)
    b = SparkSession.builder.master("local[32]").appName(f"prof11_{name}")
    base = {
        "spark.sql.shuffle.partitions": "32",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
        "spark.driver.memory": "48g",
        "spark.ui.enabled": "false",
        "spark.sql.parquet.compression.codec": "lz4",
        "spark.sql.ansi.enabled": "true",
    }
    base.update(confs)
    for k, v in base.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
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
        best = float("inf")
        for i in range(5):
            e = BTrDBEngine(spark, f"{tmp}/e{i}", ladder=False)
            t0 = time.time()
            e.bulk_load(pts)
            dt = time.time() - t0
            best = min(best, dt)
            print(f"  rep{i}: {dt:.2f}s", flush=True)
        sz = subprocess.run(["du", "-sm", f"{tmp}/e4"], capture_output=True, text=True).stdout.split()[0]
        print(f"{name}: best={best:.2f}s -> {n/best/1e6:.2f}M pts/s  table={sz}MB", flush=True)
    spark.stop()
    shutil.rmtree("/dev/shm/sparktmp", ignore_errors=True)


if __name__ == "__main__":
    if len(sys.argv) > 1:
        run_variant(sys.argv[1])
    else:
        for name in VARIANTS:
            subprocess.run([sys.executable, __file__, name])
            time.sleep(20)
