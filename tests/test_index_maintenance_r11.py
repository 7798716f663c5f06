"""Round-11 index lifecycle hardening (VERDICT r10 #2/#3 + ADVICE):

- AnnIndex tracks per-cell posting mass incrementally, so maintain() is
  a driver-side JSON read (no full-posting Spark scan per streaming
  micro-batch).
- The retrain thrash guard: after a self-sized retrain, the alarms stay
  suppressed until the corpus grows RETRAIN_GROWTH_REFIRE-fold.
- set_centroids on an index with postings raises (stale-assignment
  hazard) instead of silently breaking probe equivalence.
- compact() bounds accumulated per-batch small files for both indexes
  while preserving probe results bit-exactly, across gc().
- DedupIndex partition columns (hex prefixes) read back as STRING even
  when every populated partition value parses numerically.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from btrdb_spark.functions.ann_index import AnnIndex
from btrdb_spark.functions.dedup_index import DedupIndex

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(os.path.join(SF, "embeddings.parquet"))


def _docs(spark):
    return spark.read.parquet(os.path.join(SF, "documents.parquet"))


def _n_files(base):
    return sum(
        len(files)
        for _r, _d, files in os.walk(base)
    )


# ---- AnnIndex tracked gauge ----


def test_update_tracks_cell_counts_exactly(spark, tmp_path):
    emb = _emb(spark)
    corpus = emb.filter(F.col("vec_id") % 10 != 0)
    idx = AnnIndex(spark, str(tmp_path / "idx"))
    idx.set_centroids(corpus.filter(F.col("vec_id") < 16))
    idx.update(corpus.filter(F.col("vec_id") % 3 != 0))
    idx.update(corpus.filter(F.col("vec_id") % 3 == 0))
    tracked = idx.tracked_cell_counts()
    exact = {
        int(r["cell"]): int(r["n_vecs"]) for r in idx.cell_stats().collect()
    }
    assert tracked == exact and sum(tracked.values()) == corpus.count()


def test_maintain_no_alarm_runs_zero_spark_jobs(spark, tmp_path, monkeypatch):
    """The streaming sink checks maintain() after EVERY micro-batch; with
    the tracked tally present the no-alarm path must not touch the
    posting table at all (VERDICT r10 #3)."""
    emb = _emb(spark)
    corpus = emb.filter(F.col("vec_id") % 10 != 0)
    idx = AnnIndex(spark, str(tmp_path / "idx"))
    idx.set_centroids(corpus.filter(F.col("vec_id") < 16))
    idx.update(corpus)

    calls = []
    orig = AnnIndex.cell_stats
    monkeypatch.setattr(
        AnnIndex, "cell_stats", lambda self: calls.append(1) or orig(self)
    )
    target = corpus.count() * 2
    tracker = spark.sparkContext.statusTracker()
    jobs_before = len(tracker.getJobIdsForGroup(None) or [])
    assert idx.maintain(target_cell_mass=target) is None
    jobs_after = len(tracker.getJobIdsForGroup(None) or [])
    assert calls == [], "no-alarm maintain must not scan postings"
    assert jobs_after == jobs_before, "no-alarm maintain must launch no Spark job"


def test_maintain_thrash_guard_suppresses_refire(spark, tmp_path):
    """After a self-sized retrain, residual skew must not re-fire a full
    posting rewrite every batch; the alarm re-arms only once the corpus
    grows 1.2x past the last retrain (ADVICE r10)."""
    emb = _emb(spark)
    corpus = emb.filter((F.col("vec_id") % 10 != 0) & (F.col("vec_id") % 3 != 0))
    growth = emb.filter((F.col("vec_id") % 10 != 0) & (F.col("vec_id") % 3 == 0))
    idx = AnnIndex(spark, str(tmp_path / "idx"))
    idx.set_centroids(corpus.filter(F.col("vec_id") < 16))
    idx.update(corpus)
    n0 = corpus.count()
    target = max(1, n0 // 40)
    assert idx.maintain(target_cell_mass=target) is not None  # retrains
    snap = idx._snapshot()
    # same corpus, alarm condition still holds (target 2 << per-cell
    # mass), but the growth gate suppresses a rewrite-per-batch loop
    assert idx.maintain(target_cell_mass=2) is None
    assert idx._snapshot() == snap
    # grow the corpus past the 1.2x refire threshold: alarm re-arms
    idx.update(growth)
    total = n0 + growth.count()
    assert total >= n0 * AnnIndex.RETRAIN_GROWTH_REFIRE, "fixture must grow enough"
    assert idx.maintain(target_cell_mass=2) is not None
    assert idx._snapshot() != snap


def test_set_centroids_with_postings_raises(spark, tmp_path):
    emb = _emb(spark)
    corpus = emb.filter(F.col("vec_id") % 10 != 0)
    cents = corpus.filter(F.col("vec_id") < 16)
    idx = AnnIndex(spark, str(tmp_path / "idx"))
    idx.set_centroids(cents)
    idx.update(corpus)
    with pytest.raises(RuntimeError, match="retrain"):
        idx.set_centroids(corpus.filter(F.col("vec_id") < 32))


def test_ann_compact_preserves_probe_and_bounds_files(spark, tmp_path):
    emb = _emb(spark)
    corpus = emb.filter(F.col("vec_id") % 10 != 0)
    batch = emb.filter(F.col("vec_id") % 10 == 0)
    idx = AnnIndex(spark, str(tmp_path / "idx"))
    idx.set_centroids(corpus.filter(F.col("vec_id") < 16))
    for m in range(4):
        idx.update(corpus.filter(F.col("vec_id") % 4 == m))
    want = sorted(map(tuple, idx.probe(batch, k=5, nprobe=2).collect()))
    cells = os.path.join(idx._snapshot(), "cells")
    before = len(glob.glob(os.path.join(cells, "cell=*", "*.parquet")))
    merged = idx.compact(big_bytes=1 << 30, max_small=1)  # force merge
    assert merged > 0
    cells2 = os.path.join(idx._snapshot(), "cells")
    after = len(glob.glob(os.path.join(cells2, "cell=*", "*.parquet")))
    assert after < before
    got = sorted(map(tuple, idx.probe(batch, k=5, nprobe=2).collect()))
    assert got == want and len(got) > 0
    # tracked gauge survives the compaction generation
    assert sum(idx.tracked_cell_counts().values()) == corpus.count()
    # idempotent: nothing left to merge at this threshold
    assert idx.compact(big_bytes=1 << 30, max_small=1) == 0


def test_streaming_sink_no_posting_scan_per_batch(spark, tmp_path, monkeypatch):
    """attach_embedding_ingest checks maintain() after EVERY micro-batch;
    on ordinary (no-alarm) batches that check must never run the
    O(corpus) cell_stats scan (VERDICT r10 #3 done-bar). cell_stats is
    patched to raise: the stream must still drain cleanly, and the
    maintenance cadence must also run compact+gc without it."""
    from btrdb_spark.functions.ann_index import attach_embedding_ingest

    emb = _emb(spark)
    corpus = emb.filter(F.col("vec_id") % 10 != 0)
    cents = corpus.filter(F.col("vec_id") < 16)
    src = str(tmp_path / "src")
    corpus.write.parquet(src)
    idx = AnnIndex(spark, str(tmp_path / "idx"))
    idx.set_centroids(cents)

    def _boom(self):
        raise AssertionError("cell_stats ran during an ordinary batch")

    monkeypatch.setattr(AnnIndex, "cell_stats", _boom)
    stream = spark.readStream.schema(corpus.schema).parquet(src)
    q = attach_embedding_ingest(
        stream,
        idx,
        str(tmp_path / "ckpt"),
        target_cell_mass=corpus.count() * 10,  # generous: no alarm
        maintenance_interval_s=0.0,  # compact+gc every batch
    ).start()
    q.awaitTermination(180)
    assert q.exception() is None
    assert sum(idx.tracked_cell_counts().values()) == corpus.count()


# ---- DedupIndex compaction + gc + typing ----


def test_dedup_compact_preserves_probes_across_gc(spark, tmp_path):
    """Build in 4 batches, resolve a probe plan against the live
    generation, then compact + gc(keep=2): the pre-compaction reader's
    generation survives (keep covers it), its result is unchanged, and
    the compacted index answers both probes identically with fewer
    files."""
    docs = _docs(spark).limit(400).cache()
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
    )
    idx = DedupIndex(spark, str(tmp_path / "idx"))
    for m in range(4):
        idx.update(corpus.filter(F.col("doc_id") % 4 == m))
    pre_plan = idx.probe(batch)  # resolves the CURRENT generation
    want = sorted(map(tuple, pre_plan.collect()))
    want_exact = sorted(
        map(tuple, idx.exact_probe(corpus.limit(50)).collect())
    )
    before = _n_files(str(tmp_path / "idx"))
    merged = idx.compact(big_bytes=1 << 30, max_small=1)
    assert merged > 0
    victims = idx.gc(keep=2)  # keep = compacted + the pre-compaction gen
    assert victims, "older generations must be reaped"
    # the reader that resolved before the flip still evaluates correctly
    assert sorted(map(tuple, pre_plan.collect())) == want
    # fresh probes over the compacted generation are bit-identical
    assert sorted(map(tuple, idx.probe(batch).collect())) == want
    assert (
        sorted(map(tuple, idx.exact_probe(corpus.limit(50)).collect()))
        == want_exact
    )
    after = _n_files(str(tmp_path / "idx"))
    assert after < before


def test_dedup_partition_prefix_types_pinned_to_string(spark, tmp_path):
    """ADVICE r10 (medium): a young index whose populated pfx partitions
    all parse numerically ('07', '12') must still read pfx as STRING —
    otherwise isin('07') coerces and silently prunes live partitions."""
    idx = DedupIndex(spark, str(tmp_path / "idx"))
    gen = idx.store.new_generation(idx.base, "state")
    (
        spark.createDataFrame(
            [(1, 0, "07aaaa", "07"), (2, 1, "12bbbb", "12")],
            "doc_id long, band int, band_hash string, pfx string",
        )
        .write.partitionBy("pfx")
        .parquet(os.path.join(gen, "bands"))
    )
    (
        spark.createDataFrame(
            [(1, "07cafe", "07"), (2, "1e4abc", "1e")],
            "doc_id long, text_md5 string, hpfx string",
        )
        .write.partitionBy("hpfx")
        .parquet(os.path.join(gen, "hashes"))
    )
    idx.store.publish(idx.base, "state", gen)
    bands = idx._read(idx._snapshot(), "bands")
    hashes = idx._read(idx._snapshot(), "hashes")
    assert dict(bands.dtypes)["pfx"] == "string"
    assert dict(hashes.dtypes)["hpfx"] == "string"
    # the exact hazard: string isin over an all-numeric partition set
    assert bands.filter(F.col("pfx").isin(["07"])).count() == 1
    assert hashes.filter(F.col("hpfx").isin(["1e"])).count() == 1


# ---- shard merge ----


def test_dedup_merge_from_equals_single_index(spark, tmp_path):
    docs = _docs(spark).limit(400).cache()
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
    )
    one = DedupIndex(spark, str(tmp_path / "one"))
    one.update(corpus)
    want = sorted(map(tuple, one.probe(batch).collect()))

    a = DedupIndex(spark, str(tmp_path / "a"))
    b = DedupIndex(spark, str(tmp_path / "b"))
    a.update(corpus.filter(F.col("doc_id") % 2 == 0))
    b.update(corpus.filter(F.col("doc_id") % 2 == 1))
    a.merge_from(b)
    got = sorted(map(tuple, a.probe(batch).collect()))
    assert got == want and len(got) > 0
    # b is untouched (merge adopts by hardlink, never mutates the donor)
    assert b._snapshot() is not None
    # geometry mismatch refuses to mix incomparable signatures
    c = DedupIndex(spark, str(tmp_path / "c"), num_hashes=16, bands=4)
    c.update(corpus.limit(10))
    with pytest.raises(ValueError, match="geometry"):
        a.merge_from(c)


def test_ann_merge_from_equals_single_index(spark, tmp_path):
    emb = _emb(spark)
    corpus = emb.filter(F.col("vec_id") % 10 != 0)
    batch = emb.filter(F.col("vec_id") % 10 == 0)
    cents = corpus.filter(F.col("vec_id") < 16)
    one = AnnIndex(spark, str(tmp_path / "one"))
    one.set_centroids(cents)
    one.update(corpus)
    want = sorted(map(tuple, one.probe(batch, k=5, nprobe=2).collect()))

    a = AnnIndex(spark, str(tmp_path / "a"))
    b = AnnIndex(spark, str(tmp_path / "b"))
    a.set_centroids(cents)
    b.set_centroids(cents)
    a.update(corpus.filter(F.col("vec_id") % 3 != 0))
    b.update(corpus.filter(F.col("vec_id") % 3 == 0))
    a.merge_from(b)
    got = sorted(map(tuple, a.probe(batch, k=5, nprobe=2).collect()))
    assert got == want and len(got) > 0
    # merged tally = exact union counts
    assert sum(a.tracked_cell_counts().values()) == corpus.count()
    assert a.tracked_cell_counts() == {
        int(r["cell"]): int(r["n_vecs"]) for r in a.cell_stats().collect()
    }
    # different quantizer refuses: cell ids would mean different regions
    c = AnnIndex(spark, str(tmp_path / "c"))
    c.set_centroids(corpus.filter(F.col("vec_id") < 32))
    c.update(corpus.limit(20))
    with pytest.raises(ValueError, match="centroids"):
        a.merge_from(c)


def test_dedup_probe_caches_retired_between_probes(spark, tmp_path):
    docs = _docs(spark).limit(100).cache()
    idx = DedupIndex(spark, str(tmp_path / "idx"))
    idx.update(docs)
    batch = docs.select((F.col("doc_id") + 10_000_000).alias("doc_id"), "text")
    idx.probe(batch).count()
    n_first = len(idx._cached_frames)
    assert n_first > 0
    idx.probe(batch).count()
    assert len(idx._cached_frames) == n_first, "prior probe's caches retired"
    idx.release()
    assert idx._cached_frames == []
