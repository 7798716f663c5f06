"""r12 lifecycle fixes.

1. Age-based generation GC (VERDICT r11 wrong #2 / ADVICE r11 #2): the
   streaming sinks run gc() on a timer, which cannot honor the old
   "no reader holds plans" precondition — a cross-process prober whose
   resolved generation fell out of the keep window had its files
   deleted mid-probe. gc(min_age_s=...) now condemns a victim first and
   reaps it only once the stamp is at least min_age_s old, so a reader
   that resolved before condemnation has the full grace window.

2. AnnIndex.merge_from tally reconstruction (ADVICE r11 #4): merging a
   pre-tracking donor (no cell_counts.json) no longer silently drops
   the tracked gauge from the merged generation.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from btrdb_spark import store as store_mod
from btrdb_spark.functions.ann_index import AnnIndex
from btrdb_spark.functions.dedup_index import DedupIndex

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(os.path.join(SF, "documents.parquet"))


def _emb(spark):
    return spark.read.parquet(os.path.join(SF, "embeddings.parquet"))


# ---- store-level semantics (no Spark) ----


def test_gc_min_age_condemns_then_reaps(tmp_path):
    base = str(tmp_path)
    st = store_mod.PosixStore()
    for g in range(4):
        gen = os.path.join(base, f"t.g{g}")
        os.makedirs(gen)
        with open(os.path.join(gen, "part-0.parquet"), "w") as f:
            f.write("x")
        st.publish(base, "t", gen)
    # pass 1: victims (g0, g1) are condemned, NOT deleted
    assert st.gc_generations(base, "t", keep=2, min_age_s=3600) == []
    assert os.path.exists(os.path.join(base, "t.g0", "part-0.parquet"))
    assert os.path.exists(os.path.join(base, "t.g0", ".condemned"))
    # pass 2 within the grace window: still nothing reaped
    assert st.gc_generations(base, "t", keep=2, min_age_s=3600) == []
    assert os.path.exists(os.path.join(base, "t.g1", "part-0.parquet"))
    # grace expired: both victims reaped
    old = time.time() - 7200
    for g in ("t.g0", "t.g1"):
        os.utime(os.path.join(base, g, ".condemned"), (old, old))
    reaped = st.gc_generations(base, "t", keep=2, min_age_s=3600)
    assert sorted(os.path.basename(p) for p in reaped) == ["t.g0", "t.g1"]
    assert not os.path.exists(os.path.join(base, "t.g0"))
    # live + keep window untouched
    assert os.path.exists(os.path.join(base, "t.g3", "part-0.parquet"))
    # min_age_s=None keeps the old immediate-reap contract
    gen4 = os.path.join(base, "t.g4")
    os.makedirs(gen4)
    st.publish(base, "t", gen4)
    assert st.gc_generations(base, "t", keep=1) != []
    assert not os.path.exists(os.path.join(base, "t.g2"))


# ---- the concurrent-prober scenario against a real index ----


def test_gc_grace_preserves_prober_snapshot_across_churn(spark, tmp_path):
    """A probe plan resolved against generation G stays collectable
    while update()xN + compact() + timer-gc churn pushes G far out of
    the keep window — the exact r11 race: compact() replaces small
    files with a merged run, so G's small files exist ONLY in victim
    generations and keep-count gc killed their inodes mid-probe."""
    docs = _docs(spark).limit(400).cache()
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
    )
    idx = DedupIndex(spark, str(tmp_path / "idx"))
    for m in range(2):
        idx.update(corpus.filter(F.col("doc_id") % 4 == m))
    pre_plan = idx.probe(batch)  # the slow cross-process prober's plan
    want = sorted(map(tuple, pre_plan.collect()))
    # churn: 2 more updates + a compaction (which merges the small
    # files the pre_plan generation references) + gc on every tick,
    # exactly what the streaming sink's maintenance cadence does
    for m in range(2, 4):
        idx.update(corpus.filter(F.col("doc_id") % 4 == m))
        idx.gc(keep=2, min_age_s=3600)
    assert idx.compact(big_bytes=1 << 30, max_small=1) > 0
    idx.gc(keep=2, min_age_s=3600)
    # the prober's generation fell out of keep=2 long ago, but the
    # grace window kept its files: the old plan still evaluates to the
    # exact same answer (its generation dir is frozen — updates build
    # NEW generations)
    assert sorted(map(tuple, pre_plan.collect())) == want
    # expire the grace: victims now reap, live index unaffected
    base = str(tmp_path / "idx")
    for d in os.listdir(base):
        stamp = os.path.join(base, d, ".condemned")
        if os.path.exists(stamp):
            os.utime(stamp, (time.time() - 7200, time.time() - 7200))
    assert idx.gc(keep=2, min_age_s=3600) != []
    # the LIVE index (now holding all 4 update batches, so a superset of
    # the pre-churn corpus) still probes fine after the reap: every
    # pre-churn match is still found, plus the ones the later updates
    # added — nothing the live generation links to was deleted
    after = sorted(map(tuple, idx.probe(batch).collect()))
    assert set(want) <= set(after)


# ---- merge_from tally reconstruction ----


@pytest.mark.parametrize("strip", ["donor", "receiver"])
def test_ann_merge_reconstructs_missing_tally(spark, tmp_path, strip):
    emb = _emb(spark)
    corpus = emb.filter(F.col("vec_id") % 10 != 0)
    cents = corpus.filter(F.col("vec_id") < 16)
    a = AnnIndex(spark, str(tmp_path / "a"))
    b = AnnIndex(spark, str(tmp_path / "b"))
    a.set_centroids(cents)
    b.set_centroids(cents)
    a.update(corpus.filter(F.col("vec_id") % 3 != 0))
    b.update(corpus.filter(F.col("vec_id") % 3 == 0))
    victim = a if strip == "receiver" else b
    os.remove(os.path.join(victim._snapshot(), AnnIndex._META))
    assert victim.tracked_cell_counts() is None  # pre-tracking shard
    a.merge_from(b)
    # the merged generation keeps the tracked gauge (no silent demotion
    # of streaming maintain() back to the O(corpus) scan), and it is
    # exact: footer reconstruction == the posting-table scan
    got = a.tracked_cell_counts()
    assert got is not None
    assert got == {
        int(r["cell"]): int(r["n_vecs"]) for r in a.cell_stats().collect()
    }
    assert sum(got.values()) == corpus.count()
