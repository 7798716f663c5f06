"""Dump .explain('formatted') for the paths r12 touched, into plans/r12/.

Usage: python tools/capture_plans_r12.py {before|after}
  before — run against the HEAD (pre-r12) package materialized in
           /tmp/btrdb_r12_old (git archive HEAD), naming files *_before.txt
  after  — run against /root/repo, naming files *_after.txt

Captured plans:
  ingest_points_write   — the bulk_load points-sink frame
  ingest_ladder_partial — the bulk_load rollup-partial frame (level 30)
  ann_index_update_tally— the AnnIndex.update tally-fold input frame
"""

import io
import os
import sys
import tempfile

from contextlib import redirect_stdout

MODE = sys.argv[1] if len(sys.argv) > 1 else "after"
REPO = "/tmp/repo_head" if MODE == "before" else "/root/repo"
sys.path.insert(0, REPO)
OUT = "/root/repo/plans/r12"
os.makedirs(OUT, exist_ok=True)

from pyspark.sql import functions as F

from btrdb_spark.engine import BTrDBEngine
from btrdb_spark.session import get_spark


def dump(name: str, df) -> None:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    with open(os.path.join(OUT, f"{name}_{MODE}.txt"), "w") as f:
        f.write(buf.getvalue())
    print(f"wrote {name}_{MODE}.txt", flush=True)


def main() -> None:
    spark = get_spark(f"plans_r12_{MODE}", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    n = 200_000  # plan shape is scale-free; keep the capture fast
    per_stream = n // 64
    pts = spark.range(n).select(
        (F.col("id") / per_stream).cast("long").cast("string").alias("uuid"),
        (F.lit(1704067200_000000000) + (F.col("id") % per_stream) * 10_000_000).alias(
            "time"
        ),
        (F.rand(42) * 100).alias("value"),
    )
    with tempfile.TemporaryDirectory() as tmp:
        eng = BTrDBEngine(spark, f"{tmp}/e", ladder=True)
        eng.ladder.levels = (30,)
        v = F.lit(10)
        n_bins = max(
            eng.n_uuid_buckets, 4 * spark.sparkContext.defaultParallelism
        )
        shuffled = pts.select("uuid", "time", "value").repartition(
            n_bins, eng._ubucket(F.col("uuid")), eng._tbucket(F.col("time"))
        )
        write_frame = (
            shuffled.withColumn("version", v.cast("long"))
            .withColumn("uuid_bucket", eng._ubucket(F.col("uuid")))
            .withColumn("time_bucket", eng._tbucket(F.col("time")))
            .sortWithinPartitions("uuid_bucket", "time_bucket", "uuid", "time")
        )
        dump("ingest_points_write", write_frame)
        from btrdb_spark.plans.rollup import rollup_points

        # The ladder leg is an independent concurrent job over the
        # source in BOTH modes: r12 measured two single-pass
        # alternatives (localCheckpoint feeding both sinks: 16-90 s;
        # read-back of the written parquet: 5.48/5.85 s) against this
        # two-job shape (2.37/2.67 s) and kept the two-job shape — see
        # engine.bulk_load's r12 note and OPTIMIZATION_r12.md. The
        # before/after plans are therefore intentionally IDENTICAL for
        # the ingest path; the r12 commit-path win (shm+disk
        # spark.local.dir pair) is a session config, invisible in plans.
        partial = rollup_points(
            pts.select("uuid", "time", "value").withColumn(
                "version", v.cast("long")
            ),
            30,
            versioned=True,
        )
        dump("ingest_ladder_partial", partial)

        # AnnIndex.update tally-fold input (ADVICE r11 #3)
        from btrdb_spark.functions.ann_index import AnnIndex
        from btrdb_spark.functions.similarity import ivf_cells

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        idx = AnnIndex(spark, f"{tmp}/ann")
        idx.set_centroids(emb.filter(F.col("vec_id") < 16))
        cents = idx.centroids()
        assign = ivf_cells(emb, cents, "vec_id", "embedding", nprobe=1).select(
            "vec_id", "cell"
        )
        if MODE == "after":
            assign = assign.localCheckpoint()
        dump("ann_index_update_tally", assign.groupBy("cell").count())
    spark.stop()


if __name__ == "__main__":
    main()
