"""Incremental dedup index (functions/dedup_index.py): probe equivalence
vs the from-scratch one-shot operator, incremental maintenance across
micro-batches, epoch replay guard, and crash-residue tolerance."""

from __future__ import annotations

import glob
import os
import time

from pyspark.sql import functions as F

from btrdb_spark.functions import dedup
from btrdb_spark.functions.dedup_index import DedupIndex, attach_document_ingest

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(os.path.join(SF, "documents.parquet"))


def _pairs(df):
    return sorted(
        (r.doc_a, r.doc_b, round(r.est_jaccard, 9)) for r in df.collect()
    )


def _from_scratch_restricted(docs, pred):
    """One-shot pairs over ALL docs, restricted to pairs touching docs
    satisfying ``pred`` — the equivalence contract's right-hand side."""
    return dedup.minhash_lsh_pairs(docs).filter(
        pred(F.col("doc_a")) | pred(F.col("doc_b"))
    )


def test_probe_equals_from_scratch(spark, tmp_path):
    docs = _docs(spark)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    idx = DedupIndex(spark, str(tmp_path / "idx"))
    idx.update(corpus)
    got = _pairs(idx.probe(batch))
    want = _pairs(_from_scratch_restricted(docs, lambda c: c % 10 == 0))
    assert got == want and len(got) > 0


def test_probe_empty_index_is_intra_batch_only(spark, tmp_path):
    docs = _docs(spark)
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    idx = DedupIndex(spark, str(tmp_path / "idx"))
    got = _pairs(idx.probe(batch))
    # no corpus indexed: pairs are exactly the one-shot pairs WITHIN the batch
    want = _pairs(dedup.minhash_lsh_pairs(batch))
    assert got == want


def test_incremental_updates_accumulate(spark, tmp_path):
    """Three successive corpus batches; after each update, probing a fixed
    batch equals from-scratch over (indexed-so-far UNION batch)."""
    docs = _docs(spark)
    probe_batch = docs.filter(F.col("doc_id") % 10 == 0)
    idx = DedupIndex(spark, str(tmp_path / "idx"))
    indexed_pred_mods: list[int] = []
    for m in (1, 2, 3):
        part = docs.filter((F.col("doc_id") % 10 != 0) & (F.col("doc_id") % 3 == m - 1))
        idx.update(part)
        indexed_pred_mods.append(m - 1)
        seen = docs.filter(
            (F.col("doc_id") % 10 != 0)
            & (F.col("doc_id") % 3).isin(indexed_pred_mods)
        )
        scope = seen.unionByName(probe_batch)
        want = _pairs(
            dedup.minhash_lsh_pairs(scope).filter(
                (F.col("doc_a") % 10 == 0) | (F.col("doc_b") % 10 == 0)
            )
        )
        assert _pairs(idx.probe(probe_batch)) == want


def test_epoch_replay_guard_skips_whole_batch(spark, tmp_path):
    docs = _docs(spark)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    idx = DedupIndex(spark, str(tmp_path / "idx"))
    idx.update(corpus, epoch=0)
    snap = idx._snapshot()
    n_files = len(
        glob.glob(os.path.join(snap, "bands", "pfx=*", "*.parquet"))
    )
    assert n_files > 0
    idx.update(corpus, epoch=0)  # crash replay of the same epoch
    # skipped whole: no new generation was even published
    assert idx._snapshot() == snap
    assert len(
        glob.glob(os.path.join(snap, "bands", "pfx=*", "*.parquet"))
    ) == n_files
    assert idx.committed_epoch() == 0
    idx.update(corpus.limit(0), epoch=1)  # next epoch advances the mark
    assert idx.committed_epoch() == 1


def test_duplicate_index_rows_do_not_double_pairs(spark, tmp_path):
    """The residual crash window re-appends one batch (no epoch guard hit):
    candidate DISTINCT + per-doc sig dedup keep probe output identical."""
    docs = _docs(spark)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    idx = DedupIndex(spark, str(tmp_path / "idx"))
    idx.update(corpus)
    idx.update(corpus)  # duplicate every index row
    got = _pairs(idx.probe(batch))
    want = _pairs(_from_scratch_restricted(docs, lambda c: c % 10 == 0))
    assert got == want


def test_exact_probe_membership(spark, tmp_path):
    docs = _docs(spark)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    idx = DedupIndex(spark, str(tmp_path / "idx"))
    idx.update(corpus)
    recrawl = corpus.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + F.lit(100000)).alias("doc_id"), "text"
    )
    hits = {r.doc_id: r.keeper_doc_id for r in idx.exact_probe(recrawl).collect()}
    src = [r.doc_id for r in corpus.filter(F.col("doc_id") % 7 == 0).collect()]
    # fixture corpus has no internal exact dups -> each recrawl page maps
    # back to exactly its source doc
    assert len(src) > 0
    assert hits == {s + 100000: s for s in src}
    # fresh text: no membership hit
    fresh = spark.createDataFrame(
        [(999999, "genuinely new text never in the corpus")], "doc_id long, text string"
    )
    assert idx.exact_probe(fresh).count() == 0


def test_streaming_ingest_maintains_index(spark, tmp_path):
    """File-source stream over per-batch document drops; after the stream
    drains, the index answers probes identically to from-scratch over
    everything ingested."""
    docs = _docs(spark).cache()
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    src_dir = str(tmp_path / "src")
    os.makedirs(src_dir)
    idx = DedupIndex(spark, str(tmp_path / "idx"))
    # drop the corpus in three file-batches
    for m in range(3):
        corpus.filter(F.col("doc_id") % 3 == m).select("doc_id", "text").write.mode(
            "append"
        ).parquet(src_dir)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 2)
        .parquet(src_dir)
    )
    q = attach_document_ingest(stream, idx, str(tmp_path / "ckpt"))
    try:
        deadline = time.time() + 60
        while time.time() < deadline and idx.committed_epoch() is None:
            time.sleep(0.5)
        q.processAllAvailable()
    finally:
        q.stop()
    got = _pairs(idx.probe(batch))
    want = _pairs(_from_scratch_restricted(docs, lambda c: c % 10 == 0))
    assert got == want and len(got) > 0


def test_update_snapshot_isolation(spark, tmp_path):
    """VERDICT r9 #4: a probe plan resolved BEFORE an update sees the
    pre-update index in full even when executed after the publish —
    whole batches or nothing, never sigs without their bands."""
    docs = _docs(spark)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    idx = DedupIndex(spark, str(tmp_path / "idx"))
    first = corpus.filter(F.col("doc_id") % 3 != 0)
    idx.update(first)
    before = _pairs(idx.probe(batch))

    held = idx.probe(batch)  # plan resolved at snapshot g_n
    idx.update(corpus.filter(F.col("doc_id") % 3 == 0))
    assert _pairs(held) == before, "held plan saw a concurrent update"
    # a fresh probe sees the whole second batch: == from-scratch contract
    want = _pairs(
        _from_scratch_restricted(docs, lambda c: c % 10 == 0)
    )
    assert _pairs(idx.probe(batch)) == want


def test_failed_update_publishes_nothing(spark, tmp_path, monkeypatch):
    """A crash before the pointer flip leaves the live index unchanged —
    the torn-batch window the in-place append design had (a probe could
    previously see the batch's sigs landed but its bands missing)."""
    import pytest

    docs = _docs(spark)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    idx = DedupIndex(spark, str(tmp_path / "idx"))
    first = corpus.filter(F.col("doc_id") % 3 != 0)
    idx.update(first)
    before = _pairs(idx.probe(batch))
    before_exact = idx.exact_probe(corpus.limit(5)).count()

    def boom(*a, **k):
        raise RuntimeError("crash before publish")

    monkeypatch.setattr(idx, "_publish", boom)
    with pytest.raises(RuntimeError):
        idx.update(corpus.filter(F.col("doc_id") % 3 == 0))
    monkeypatch.undo()
    assert _pairs(idx.probe(batch)) == before
    assert idx.exact_probe(corpus.limit(5)).count() == before_exact
    # recovery retry commits the whole batch
    idx.update(corpus.filter(F.col("doc_id") % 3 == 0))
    want = _pairs(_from_scratch_restricted(docs, lambda c: c % 10 == 0))
    assert _pairs(idx.probe(batch)) == want


def test_probe_prunes_band_partitions(spark, tmp_path):
    """VERDICT r9 #5: the band table is partitioned by band-hash prefix
    and a small probe's scan carries a PartitionFilter over the batch's
    prefix set — a strict subset of the 16^band_pfx_len partitions — so
    probe cost tracks the batch's hash footprint, not the corpus file
    count. (inputFiles() ignores partition pruning, so the executed
    plan's PartitionFilters is the observable.)"""
    import re

    docs = _docs(spark)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    idx = DedupIndex(spark, str(tmp_path / "idx"))
    idx.update(corpus)
    batch = docs.filter(F.col("doc_id").isin([0, 10]))
    p = idx.probe(batch)
    plan = p._jdf.queryExecution().executedPlan().toString()
    insets = re.findall(r"PartitionFilters: \[pfx#\d+ INSET ([^\]]+)\]", plan)
    assert insets, "band scan lost its partition filter"
    n_pruned = len(insets[0].split(","))
    # 2 docs * 8 bands = at most 16 distinct prefixes of 256 partitions
    assert 0 < n_pruned <= 16
    # and the pruned probe is still exact vs from-scratch
    want = _pairs(
        _from_scratch_restricted(
            docs.filter(
                (F.col("doc_id") % 10 != 0) | F.col("doc_id").isin([0, 10])
            ),
            lambda c: c.isin([0, 10]),
        )
    )
    assert _pairs(p) == want


def test_exact_probe_prunes_hash_partitions(spark, tmp_path):
    """Same pruning contract for the md5 sidecar: exact_probe's index
    scan carries an hpfx PartitionFilter sized to the batch."""
    import re

    docs = _docs(spark)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    idx = DedupIndex(spark, str(tmp_path / "idx"))
    idx.update(corpus)
    recrawl = corpus.limit(3).select(
        (F.col("doc_id") + F.lit(100000)).alias("doc_id"), "text"
    )
    p = idx.exact_probe(recrawl)
    got = {(r.doc_id, r.keeper_doc_id) for r in p.collect()}
    assert len(got) == 3 and all(k == d - 100000 for d, k in got)
    plan = p._jdf.queryExecution().executedPlan().toString()
    # small sets render as IN (..), larger as INSET ..
    insets = re.findall(
        r"PartitionFilters: \[hpfx#\d+ IN(?:SET)? \(?([^\])]+)\)?\]", plan
    )
    assert insets and 0 < len(insets[0].split(",")) <= 3
