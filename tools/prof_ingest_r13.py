"""r13 ingest A/B (VERDICT r12 #2): close the remaining ~0.7 s between
the write-only leg and the two-job commit, and the commit-phase idle.

Variants (each in a fresh JVM; alternate base runs bracket candidates so
this box's drifting windows can't fake a win):
  base         — shipped bulk_load (two concurrent jobs, n_bins=128)
  write_only   — engine with ladder=False: the points write leg alone
  ladder_only  — ladder.ingest_batch alone (the other leg)
  bins512      — n_bins=512: 64 distinct (uuid_bucket,time_bucket) keys
                 hashed into 128 bins leave ~14 collision tasks carrying
                 2 keys (2x stragglers, guide §2.5 balls-in-bins); 512
                 bins cut expected collisions ~4x at the price of more
                 (empty) task launches
  fair         — spark.scheduler.mode=FAIR: both legs' stages share
                 cores evenly instead of FIFO backfill (guide §2.6)

Usage: python tools/prof_ingest_r13.py [variant ...]
no args = base, bins512, base, fair, base, write_only, ladder_only
"""

import os
import subprocess
import sys
import tempfile
import time

VARIANTS = ("base", "write_only", "ladder_only", "bins512", "fair")


def run_variant(name: str) -> None:
    sys.path.insert(0, "/root/repo")
    if name == "fair":
        os.environ["BTRDB_SPARK_EXTRA_CONF"] = "spark.scheduler.mode=FAIR"
    from pyspark.sql import functions as F

    from btrdb_spark import engine as eng_mod
    from btrdb_spark.engine import BTrDBEngine
    from btrdb_spark.session import get_spark

    builder_patch = None
    if name == "fair":
        # session.py has no extra-conf hook; patch the builder via
        # SparkSession config through environment is not possible -> set
        # it on the builder by monkeypatching get_spark's output is too
        # late (boot-time), so build the session here with the extra conf.
        from pyspark.sql import SparkSession

        from btrdb_spark.session import _default_local_dir

        local_dir = _default_local_dir()
        if local_dir:
            for d in local_dir.split(","):
                os.makedirs(d, exist_ok=True)
        b = (
            SparkSession.builder.master("local[32]")
            .appName("prof13_fair")
            .config("spark.sql.shuffle.partitions", "32")
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.driver.memory", "48g")
            .config("spark.ui.enabled", "false")
            .config("spark.sql.parquet.compression.codec", "zstd")
            .config("spark.sql.ansi.enabled", "true")
            .config("spark.scheduler.mode", "FAIR")
        )
        if local_dir:
            b = b.config("spark.local.dir", local_dir)
        spark = b.getOrCreate()
    else:
        spark = get_spark(f"prof13_{name}", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    n = 20_000_000
    per_stream = n // 1024
    pts = spark.range(n).select(
        (F.col("id") / per_stream).cast("long").cast("string").alias("uuid"),
        (F.lit(1704067200_000000000) + (F.col("id") % per_stream) * 10_000_000).alias(
            "time"
        ),
        (F.rand(42) * 100).alias("value"),
    ).cache()
    pts.count()
    pts.filter(F.col("time") >= 0).select("uuid", "time", "value").write.format(
        "noop"
    ).mode("overwrite").save()

    if name == "bins512":
        # bulk_load's n_bins = max(n_uuid_buckets, 4*parallelism) is the
        # only max() on its path (engine.py:731); shadowing the module
        # global pins the bin count WITHOUT touching the partition
        # layout (n_uuid_buckets itself must stay 64 — it defines the
        # uuid_bucket column values, i.e. the data written).
        eng_mod.max = lambda *a, **k: 512

    with tempfile.TemporaryDirectory() as tmp:
        reps = []
        for i in range(5):
            os.sync()
            time.sleep(3)
            eng = BTrDBEngine(spark, f"{tmp}/e{i}", ladder=(name != "write_only"))
            if eng.ladder is not None:
                eng.ladder.levels = (30,)
            spark.sparkContext.setJobDescription(f"ingest {name} rep{i}")
            t0 = time.time()
            if name == "ladder_only":
                v = F.lit(1).cast("long")
                eng.ladder.ingest_batch(
                    pts.select("uuid", "time", "value").withColumn("version", v)
                )
            else:
                eng.bulk_load(pts.select("uuid", "time", "value"))
            reps.append(time.time() - t0)
            print(f"  rep{i}: {reps[-1]:.2f}s", flush=True)
            if i >= 2:
                lo1, lo2 = sorted(reps)[:2]
                if lo2 <= lo1 * 1.2:
                    break
        best = min(reps)
        print(
            f"{name}: floor={best:.2f}s -> {n/best/1e6:.2f}M pts/s  "
            f"reps={[round(r, 2) for r in reps]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    names = sys.argv[1:] or [
        "base", "bins512", "base", "fair", "base", "write_only", "ladder_only",
    ]
    if len(names) == 1:
        run_variant(names[0])
    else:
        for nm in names:
            subprocess.run([sys.executable, __file__, nm], check=False)
            time.sleep(10)
