"""Incremental dedup-index scale probe (verdict r8 ask #1 done-bar):
per-batch probe cost must stay ~flat as the indexed corpus grows 10x —
the probe touches O(batch) text + an id/hash-only index scan, never the
corpus text. Reuses the prof_corpus synthetic corpus generator shape.

Run: python tools/prof_dedup_index.py [--long]
Prints probe wall time for a fixed 1k-doc batch against indices built at
two corpus sizes 10x apart, plus the update() cost per 20k-doc batch at
both index sizes (maintenance must be O(batch), not O(corpus)) and the
from-scratch alternative's cost. Default mode uses the cached 55-token
prof_corpus docs (constants dominate; from-scratch still wins there);
--long uses 550-token uncached docs — the real regime, where corpus
text re-processing dwarfs the id/hash-only index scan.

Measured (local[32], 2026-08-15):
  default: index 20k->200k: probe 2.70->3.20s, update 2.11->2.23s
  --long:  index 40k->400k: probe 2.67->3.51s (1.3x, with 6.9x more
           output pairs), update 3.75->4.43s, from-scratch 1.35->50.92s
           -> probe beats from-scratch 14.5x at 400k docs and the gap
           widens linearly with corpus text size.
"""
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from btrdb_spark.functions.dedup_index import DedupIndex
from btrdb_spark.session import get_spark

CORPUS = "/tmp/prof_corpus_docs.parquet"  # built by prof_corpus.py
LONG_CORPUS = "/tmp/prof_corpus_long_docs.parquet"  # --long mode
BATCH_N = 1_000


def build_long(spark, n=400_000, tokens=550):
    """--long corpus: 10x the tokens/doc of the prof_corpus shape. This is
    the regime the index exists for — corpus TEXT cost (shingle+minhash,
    ~linear in tokens) dwarfs the id/hash-only index scan, so from-scratch
    pays 10x more per crawl while the probe's cost is unchanged."""
    if os.path.exists(LONG_CORPUS):
        return
    tok = (
        "concat('w', cast(pmod(xxhash64(doc_id * 57 + i), "
        "cast(pow(10, 1 + pmod(xxhash64(doc_id * 131 + i), 4)) as bigint)) as string))"
    )
    spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.expr(
            f"array_join(transform(sequence(1, {tokens}), i -> {tok}), ' ')"
        ).alias("text"),
    ).write.mode("overwrite").parquet(LONG_CORPUS)


def main():
    spark = get_spark("prof_dedup_index", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    long_mode = "--long" in sys.argv
    if long_mode:
        build_long(spark)
        # NOT cached: the 100 TB corpus does not fit in memory — every
        # from-scratch crawl re-reads and re-shingles it from storage
        docs = spark.read.parquet(LONG_CORPUS)
        sizes = (40_000, 400_000)
    else:
        if not os.path.exists(CORPUS):
            import prof_corpus

            prof_corpus.build(spark)
        docs = spark.read.parquet(CORPUS).cache()
        docs.count()
        sizes = (20_000, 200_000)
    # fixed probe batch: 1k docs re-keyed above the corpus id space, text
    # from corpus docs (so LSH hits exist) — the "today's crawl" shape
    batch = (
        docs.filter(F.col("doc_id") % 200 == 7)
        .limit(BATCH_N)
        .select((F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"), "text")
        .cache()
    )
    batch.count()

    for n in sizes:
        corpus = docs.filter(F.col("doc_id") < n)
        base = f"/tmp/prof_dedup_index_{'long_' if long_mode else ''}{n}"
        shutil.rmtree(base, ignore_errors=True)
        idx = DedupIndex(spark, base)
        t0 = time.time()
        idx.update(corpus)
        t_build = time.time() - t0
        # incremental maintenance cost at this index size (O(batch) check)
        t0 = time.time()
        idx.update(
            corpus.limit(20_000).select(
                (F.col("doc_id") + F.lit(20_000_000)).alias("doc_id"), "text"
            )
        )
        t_update = time.time() - t0
        best = float("inf")
        pairs = None
        for _ in range(3):
            t0 = time.time()
            pairs = idx.probe(batch).count()
            best = min(best, time.time() - t0)
        # the alternative the index replaces: from-scratch LSH over
        # (corpus UNION batch) restricted to the batch — recomputes
        # shingles+minhash for the WHOLE corpus text every crawl
        from btrdb_spark.functions import dedup as _dd

        scratch = float("inf")
        for _ in range(2):
            t0 = time.time()
            _dd.minhash_lsh_pairs(
                corpus.select("doc_id", "text").unionByName(batch)
            ).filter(
                (F.col("doc_a") >= 10_000_000) | (F.col("doc_b") >= 10_000_000)
            ).count()
            scratch = min(scratch, time.time() - t0)
        # partition-pruning readout (VERDICT r9 #5): a SMALL probe's band
        # scan must carry a PartitionFilter covering a strict subset of
        # the 16^band_pfx_len partitions (the 1k batch's 8k band hashes
        # saturate 256 prefixes — pruning is the small-probe win; the
        # docstring documents that envelope honestly)
        from btrdb_spark.functions.dedup import band_rows_of, minhash_signatures

        small = batch.limit(20)
        t0 = time.time()
        sp = idx.probe(small)
        sp.count()
        t_small = time.time() - t0
        plan = sp._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [pfx" in plan, "band scan lost its partition filter"
        # the INSET is exactly the batch's prefix set (the plan's own
        # list is elided by maxToStringFields) — recount it directly
        n_read = (
            band_rows_of(
                minhash_signatures(small, idx.n, idx.num_hashes, idx.text_col),
                idx.bands,
                idx.rows_per_band,
            )
            .select(F.substring(F.col("band_hash"), 1, idx.band_pfx_len))
            .distinct()
            .count()
        )
        n_total = 16 ** idx.band_pfx_len
        print(
            f"index={n:>7} docs  build={t_build:6.2f}s  "
            f"update(20k)={t_update:6.2f}s  probe(1k)={best:6.2f}s  "
            f"from_scratch={scratch:6.2f}s  pairs={pairs}  "
            f"probe(20)={t_small:.2f}s reading {n_read}/{n_total} band partitions"
        )




def churn():
    """VERDICT r10 #2 done-bar: 50 consecutive update() batches with the
    maintenance cadence (compact+gc every 10 batches, the streaming-sink
    pattern) must show FLAT per-batch wall time and BOUNDED file count.
    Without compaction each update hardlinks every prior file (+~512
    new), so per-batch cost grows with batch count. Prints per-batch
    seconds and the generation's file count every 5 batches, with and
    without the cadence, plus a final probe equivalence check."""
    spark = get_spark(
        "prof_dedup_churn", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").cache()
    docs.count()
    n_batches, batch_sz = 50, 400

    def n_files(base):
        total = 0
        for root, _d, files in os.walk(base):
            total += len(files)
        return total

    results = {}
    for mode in ("cadence", "none"):
        base = f"/tmp/prof_dedup_churn_{mode}"
        shutil.rmtree(base, ignore_errors=True)
        idx = DedupIndex(spark, base)
        times = []
        for b in range(n_batches):
            batch = docs.filter(
                F.col("doc_id") % n_batches == b
            ).limit(batch_sz).select(
                (F.col("doc_id") + b * 1_000_000).alias("doc_id"), "text"
            )
            t0 = time.time()
            idx.update(batch)
            if mode == "cadence" and (b + 1) % 10 == 0:
                idx.compact(big_bytes=64 << 20, max_small=8)
                idx.gc(keep=2)
            times.append(time.time() - t0)
            if (b + 1) % 10 == 0:
                print(
                    f"{mode}: batch {b+1:>2}  update={times[-1]:5.2f}s  "
                    f"mean(last5)={sum(times[-5:])/5:5.2f}s  "
                    f"files={n_files(base)}",
                    flush=True,
                )
        results[mode] = (times, n_files(base))
    (tc, fc), (tn, fn_) = results["cadence"], results["none"]
    print(
        f"cadence: first5={sum(tc[:5])/5:.2f}s last5={sum(tc[-5:])/5:.2f}s files={fc}\n"
        f"none   : first5={sum(tn[:5])/5:.2f}s last5={sum(tn[-5:])/5:.2f}s files={fn_}",
        flush=True,
    )
    # probe equivalence: the compacted index answers == the uncompacted one
    probe = docs.filter(F.col("doc_id") % 500 == 3).limit(200).select(
        (F.col("doc_id") + 900_000_000).alias("doc_id"), "text"
    )
    a = sorted(map(tuple, DedupIndex(spark, "/tmp/prof_dedup_churn_cadence").probe(probe).collect()))
    bq = sorted(map(tuple, DedupIndex(spark, "/tmp/prof_dedup_churn_none").probe(probe).collect()))
    print(f"probe rows equal: {a == bq} ({len(a)} rows)", flush=True)
    spark.stop()


def churn10x():
    """VERDICT r11 #7 follow-through: the r11 churn profile ran at 1x
    fixture scale (sf0.01, 400-doc batches); this runs the SHIPPED sink
    cadence — compact() + gc(keep=2, min_age_s=...) every 10 batches,
    the age-graced r12 call shape — at 10x (sf0.1, 4000-doc batches,
    50 batches = 200k indexed docs) and checks the two claims that must
    hold at scale: per-batch update cost stays FLAT (O(batch), never
    O(corpus)) and the live generation's file count PLATEAUS. A fixed
    1k-doc probe is timed against the young (10-batch) and full
    (50-batch) index — flat probe cost is the third claim. Finally the
    grace window is force-expired and gc re-run to show the post-reap
    footprint (condemned generations hold hardlinks, so reaping frees
    directory entries, not much data)."""
    spark = get_spark(
        "prof_dedup_churn10x", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").cache()
    docs.count()
    n_batches, batch_sz = 50, 4_000
    grace_s = 120.0

    def n_files(base):
        total = 0
        for _root, _d, files in os.walk(base):
            total += len(files)
        return total

    base = "/tmp/prof_dedup_churn10x"
    shutil.rmtree(base, ignore_errors=True)
    idx = DedupIndex(spark, base)
    probe_batch = docs.filter(F.col("doc_id") % 5 == 3).limit(1_000).select(
        (F.col("doc_id") + 900_000_000).alias("doc_id"), "text"
    )
    times = []
    for b in range(n_batches):
        batch = docs.filter(F.col("doc_id") % n_batches == b).limit(
            batch_sz
        ).select((F.col("doc_id") + b * 1_000_000).alias("doc_id"), "text")
        t0 = time.time()
        idx.update(batch)
        times.append(time.time() - t0)
        maint_s = 0.0
        if (b + 1) % 10 == 0:
            t1 = time.time()
            idx.compact(big_bytes=64 << 20, max_small=8)
            idx.gc(keep=2, min_age_s=grace_s)
            maint_s = time.time() - t1
        if (b + 1) % 5 == 0:
            print(
                f"10x: batch {b+1:>2}  update={times[-1]:5.2f}s  "
                f"mean(last5)={sum(times[-5:])/5:5.2f}s  "
                f"maint={maint_s:5.2f}s  files={n_files(base)}",
                flush=True,
            )
        if b + 1 in (10, 50):
            t0 = time.time()
            rows = idx.probe(probe_batch).count()
            print(
                f"10x: probe after batch {b+1}: {time.time()-t0:.2f}s "
                f"({rows} rows)",
                flush=True,
            )
    print(
        f"10x cadence: first5={sum(times[:5])/5:.2f}s "
        f"last5={sum(times[-5:])/5:.2f}s files={n_files(base)}",
        flush=True,
    )
    # expire the grace and reap: the steady-state footprint
    for d in os.listdir(base):
        stamp = os.path.join(base, d, ".condemned")
        if os.path.exists(stamp):
            os.utime(stamp, (time.time() - 7200, time.time() - 7200))
    reaped = idx.gc(keep=2, min_age_s=grace_s)
    print(
        f"10x post-grace reap: {len(reaped)} generations, "
        f"files={n_files(base)}",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    if "--churn10x" in sys.argv:
        churn10x()
    elif "--churn" in sys.argv:
        churn()
    else:
        main()
