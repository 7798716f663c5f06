"""r13 phase attribution for DedupIndex.probe — the dedup_incremental*
floor (3 gated queries x ~3.3-3.6 s, the largest untouched family by
combined floor after the substring kernel).

Replicates q_dedup_incremental's shape at sf0.1: index built ONCE over
doc_id % 10 != 0 (4500 docs), then the probe's internal phases are
timed cumulatively with noop sinks (guide §1.4), 3 reps each, floor
reported. The full probe is also timed end-to-end, bracketing the
phases, so drift is visible.

Usage: python tools/prof_dedup_probe_r13.py
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def floor_of(fn, reps: int = 3) -> float:
    out = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        out.append(time.time() - t0)
    return min(out)


def main() -> None:
    from btrdb_spark.functions.dedup_index import DedupIndex
    from btrdb_spark.functions.dedup import (
        minhash_signatures,
        band_rows_of,
        _pairs_from_bucket,
    )
    from btrdb_spark.session import get_spark
    from btrdb_spark.sources.tables import load_table

    spark = get_spark("prof_dedup_probe_r13", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.1"
    docs = load_table(spark, sf, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    batch = docs.filter(F.col("doc_id") % 10 == 0)

    idx = DedupIndex(spark, tempfile.mkdtemp(prefix="prof_dedup_"))
    idx.update(corpus)

    spark.sparkContext.setJobDescription("full probe warm")
    noop(idx.probe(batch))

    t = {}
    spark.sparkContext.setJobDescription("full probe")
    t["full_probe"] = floor_of(lambda: noop(idx.probe(batch)))

    # phase 1: batch signatures alone
    spark.sparkContext.setJobDescription("batch_sigs")
    t["batch_sigs"] = floor_of(
        lambda: noop(minhash_signatures(batch, idx.n, idx.num_hashes, idx.text_col))
    )

    # phase 2: + band rows
    def _bands():
        s = minhash_signatures(batch, idx.n, idx.num_hashes, idx.text_col)
        noop(band_rows_of(s, idx.bands, idx.rows_per_band))

    spark.sparkContext.setJobDescription("batch_bands")
    t["batch_bands"] = floor_of(_bands)

    # phase 3: + intra pair generation
    def _intra():
        s = minhash_signatures(batch, idx.n, idx.num_hashes, idx.text_col)
        b = band_rows_of(s, idx.bands, idx.rows_per_band)
        noop(
            b.groupBy("band", "band_hash")
            .agg(F.sort_array(F.collect_set("doc_id")).alias("ds"))
            .filter(F.size("ds") > 1)
            .select(F.explode(_pairs_from_bucket(F.col("ds"))).alias("p"))
            .select(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        )

    spark.sparkContext.setJobDescription("intra_pairs")
    t["intra_pairs"] = floor_of(_intra)

    # phase 4: the pfx collect alone (driver round trip; includes sig+band compute)
    def _pfx():
        s = minhash_signatures(batch, idx.n, idx.num_hashes, idx.text_col)
        b = band_rows_of(s, idx.bands, idx.rows_per_band)
        b.select(
            F.substring(F.col("band_hash"), 1, idx.band_pfx_len).alias("pfx")
        ).distinct().collect()

    spark.sparkContext.setJobDescription("pfx_collect")
    t["pfx_collect"] = floor_of(_pfx)

    # phase 5: index band scan + broadcast join (reusing a cached bands frame)
    snap = idx._snapshot()
    idx_bands = idx._read(snap, "bands")
    s = minhash_signatures(batch, idx.n, idx.num_hashes, idx.text_col).cache()
    b = band_rows_of(s, idx.bands, idx.rows_per_band).cache()
    pfxs = [
        r["pfx"]
        for r in b.select(
            F.substring(F.col("band_hash"), 1, idx.band_pfx_len).alias("pfx")
        )
        .distinct()
        .collect()
    ]

    def _hit():
        noop(
            idx_bands.filter(F.col("pfx").isin(pfxs)).join(
                F.broadcast(
                    b.select("band", "band_hash", F.col("doc_id").alias("new_id"))
                ),
                ["band", "band_hash"],
            )
        )

    spark.sparkContext.setJobDescription("hit_join_cachedbands")
    t["hit_join_cachedbands"] = floor_of(_hit)

    spark.sparkContext.setJobDescription("full probe again")
    t["full_probe_2"] = floor_of(lambda: noop(idx.probe(batch)))

    for k, v in t.items():
        print(f"{k}: {v:.3f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()


def tail_variants() -> None:
    """Measure the final-sort increment: the probe tail with orderBy
    (shipped) vs without vs single-partition sort. Same rows."""
    import tempfile

    from btrdb_spark.functions.dedup_index import DedupIndex
    from btrdb_spark.session import get_spark
    from btrdb_spark.sources.tables import load_table

    spark = get_spark("prof_dedup_tail_r13", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.1"
    docs = load_table(spark, sf, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    idx = DedupIndex(spark, tempfile.mkdtemp(prefix="prof_dedup_t_"))
    idx.update(corpus)
    noop(idx.probe(batch))  # warm

    import btrdb_spark.functions.dedup_index as dimod

    orig_probe = dimod.DedupIndex.probe

    def probe_nosort(self, batch_docs):
        df = orig_probe(self, batch_docs)
        # strip the trailing global sort by re-deriving: not possible from
        # the returned frame; instead monkeypatch orderBy during the call
        return df

    t = {}
    spark.sparkContext.setJobDescription("tail shipped")
    t["shipped_orderBy"] = floor_of(lambda: noop(idx.probe(batch)))

    # monkeypatch DataFrame.orderBy to a no-op inside probe
    from pyspark.sql import DataFrame as _DF

    real_orderBy = _DF.orderBy
    _DF.orderBy = lambda self, *a, **k: self
    try:
        spark.sparkContext.setJobDescription("tail nosort")
        t["no_sort"] = floor_of(lambda: noop(idx.probe(batch)))
    finally:
        _DF.orderBy = real_orderBy

    _DF.orderBy = lambda self, *a, **k: real_orderBy(
        self.repartition(1), *a, **k
    )
    try:
        spark.sparkContext.setJobDescription("tail 1part sort")
        t["onepart_sort"] = floor_of(lambda: noop(idx.probe(batch)))
    finally:
        _DF.orderBy = real_orderBy

    spark.sparkContext.setJobDescription("tail shipped2")
    t["shipped_orderBy_2"] = floor_of(lambda: noop(idx.probe(batch)))
    for k, v in t.items():
        print(f"{k}: {v:.3f}s", flush=True)
    spark.stop()
