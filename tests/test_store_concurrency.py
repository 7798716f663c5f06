"""Multi-process writer safety (VERDICT r4 #5, ADVICE r4 #3).

The reference serializes writers per-uuid cluster-wide via the MASH ring
write lock (quasar.go:197, internal/configprovider/clustering.go:78-126).
The Spark engine's RLock only covers one process, so the store backends
carry the cross-process contract instead: publish(..., expected=...) is a
compare-and-swap that raises CommitConflict when a concurrent writer
committed first — never silent last-writer-wins.
"""

from __future__ import annotations

import os
import time

import pytest

from pyspark.sql import functions as F

from btrdb_spark import store
from btrdb_spark.engine import BTrDBEngine
from btrdb_spark.store import CommitConflict, ManifestLogStore, PosixStore


def _mkgen(base: str, name: str, n: int) -> str:
    path = os.path.join(base, f"{name}.g{n}")
    os.makedirs(path, exist_ok=True)
    return path


@pytest.mark.parametrize("backend", [PosixStore, ManifestLogStore])
def test_cas_publish_conflict_and_rebase(tmp_path, backend):
    s = backend()
    base = str(tmp_path)
    g0 = _mkgen(base, "t", 0)
    s.publish(base, "t", g0)
    assert s.resolve(base, "t") == g0

    # two writers both resolve g0 and build on top of it
    ga, gb = _mkgen(base, "t", 1), _mkgen(base, "t", 2)
    s.publish(base, "t", ga, expected=g0)  # A wins
    with pytest.raises(CommitConflict):
        s.publish(base, "t", gb, expected=g0)  # B must NOT supersede A
    assert s.resolve(base, "t") == ga, "winner's commit survives"

    # B re-resolves, rebuilds on top of A, re-publishes: succeeds
    gb2 = _mkgen(base, "t", 3)
    s.publish(base, "t", gb2, expected=s.resolve(base, "t"))
    assert s.resolve(base, "t") == gb2


def test_manifest_publish_is_idempotent_for_same_generation(tmp_path):
    s = ManifestLogStore()
    base = str(tmp_path)
    g0 = _mkgen(base, "t", 0)
    s.publish(base, "t", g0)
    g1 = _mkgen(base, "t", 1)
    s.publish(base, "t", g1, expected=g0)
    # replay of the SAME winning generation (crash-after-commit rerun)
    s.publish(base, "t", g1, expected=g0)
    assert s.resolve(base, "t") == g1


def test_manifest_log_pruned_on_publish(tmp_path):
    """ADVICE r4 (low): the commit log must not grow with total commit
    count — resolve() listdir+sorts it on every lookup."""
    s = ManifestLogStore()
    base = str(tmp_path)
    n_commits = ManifestLogStore.LOG_KEEP + 40
    for i in range(n_commits):
        s.publish(base, "t", _mkgen(base, "t", i))
    log_dir = os.path.join(base, "t._log")
    entries = [f for f in os.listdir(log_dir) if f.endswith(".json")]
    assert len(entries) <= ManifestLogStore.LOG_KEEP + 1
    assert s.resolve(base, "t") == os.path.join(base, f"t.g{n_commits - 1}")


def test_posix_dead_holder_does_not_block(tmp_path):
    """A dead writer's leftover lock FILE never blocks publishes: flock
    exclusivity lives on the inode and died with the holder, so the file
    content (a stale pid) is irrelevant and no staleness window exists."""
    s = PosixStore()
    base = str(tmp_path)
    g0 = _mkgen(base, "t", 0)
    s.publish(base, "t", g0)
    lock = os.path.join(base, "t.CURRENT.lock")
    with open(lock, "w") as f:
        f.write("99999")  # dead holder's leftovers
    old = time.time() - 3600
    os.utime(lock, (old, old))
    g1 = _mkgen(base, "t", 1)
    s.publish(base, "t", g1, expected=g0)  # acquires immediately
    assert s.resolve(base, "t") == g1


def test_manifest_interleaved_commit_conflicts(tmp_path, monkeypatch):
    """ADVICE r5 #1: writer B passes the expected-check, then writer C
    commits, then B claims its slot — B must hit CommitConflict (the slot
    number is the CAS token), never silently supersede C."""
    s = ManifestLogStore()
    base = str(tmp_path)
    g0 = _mkgen(base, "t", 0)
    s.publish(base, "t", g0)
    gc, gb = _mkgen(base, "t", 1), _mkgen(base, "t", 2)

    orig = s._highest_valid
    fired = {"done": False}

    def interleave(log_dir):
        head = orig(log_dir)
        if not fired["done"]:
            fired["done"] = True
            # C commits BETWEEN B's expected-check read and B's slot claim
            ManifestLogStore().publish(base, "t", gc, expected=g0)
        return head

    monkeypatch.setattr(s, "_highest_valid", interleave)
    with pytest.raises(CommitConflict):
        s.publish(base, "t", gb, expected=g0)
    assert s.resolve(base, "t") == gc, "the interleaved winner's commit survives"


def test_manifest_cas_conflicts_on_torn_entry(tmp_path):
    """ADVICE r6 #1: claims are atomic-with-content (tmp + fsync +
    link), so a torn entry can only be genuine corruption — a CAS
    publish must CONFLICT on it, never step over (the old step-over path
    was a lost-update race against a live writer mid-put)."""
    s = ManifestLogStore()
    base = str(tmp_path)
    g0 = _mkgen(base, "t", 0)
    s.publish(base, "t", g0)
    log_dir = os.path.join(base, "t._log")
    with open(os.path.join(log_dir, f"{1:020}.json"), "w") as f:
        f.write('{"gen": "t.g9", "crc"')  # corrupt entry
    g1 = _mkgen(base, "t", 1)
    with pytest.raises(CommitConflict):
        s.publish(base, "t", g1, expected=g0)
    # readers still see the last good commit through the crc fallback
    assert s.resolve(base, "t") == g0


def test_manifest_claims_never_visible_torn(tmp_path):
    """The lost-update scenario ADVICE r6 #1 describes: contender B must
    never observe writer A's in-flight claim as an empty/torn slot. With
    link-based claims the slot name appears only WITH its full body, so
    hammering concurrent CAS publishes at the same expected head yields
    exactly one winner and N-1 CommitConflicts — no silent supersede."""
    import threading

    s = ManifestLogStore()
    base = str(tmp_path)
    g0 = _mkgen(base, "t", 0)
    s.publish(base, "t", g0)
    gens = [_mkgen(base, "t", i + 1) for i in range(8)]
    wins: list[str] = []
    errs: list[Exception] = []
    lock = threading.Lock()
    barrier = threading.Barrier(len(gens))

    def contend(gen):
        barrier.wait()
        try:
            ManifestLogStore().publish(base, "t", gen, expected=g0)
            with lock:
                wins.append(gen)
        except CommitConflict as e:
            with lock:
                errs.append(e)

    ts = [threading.Thread(target=contend, args=(g,)) for g in gens]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert len(wins) == 1, f"exactly one CAS winner, got {wins}"
    assert len(errs) == len(gens) - 1
    assert s.resolve(base, "t") == wins[0]
    # every slot in the log is complete and well-formed — no torn debris
    log_dir = os.path.join(base, "t._log")
    for fn in os.listdir(log_dir):
        if fn.endswith(".json"):
            assert s._read_entry(os.path.join(log_dir, fn)) is not None


def test_manifest_highest_valid_skips_missing_gen_dir(tmp_path):
    """ADVICE r6 #2: _highest_valid must apply resolve()'s existence
    filter so the CAS view of 'current' and the reader view agree after
    generation GC removes a logged-but-dead generation dir."""
    import shutil

    s = ManifestLogStore()
    base = str(tmp_path)
    g0 = _mkgen(base, "t", 0)
    s.publish(base, "t", g0)
    g1 = _mkgen(base, "t", 1)
    s.publish(base, "t", g1)
    shutil.rmtree(g1)  # anomalous GC of the logged generation
    log_dir = os.path.join(base, "t._log")
    assert s.resolve(base, "t") == g0
    head = s._highest_valid(log_dir)
    assert head is not None and head[1] == os.path.basename(g0)


def test_posix_stale_steal_single_winner(tmp_path):
    """ADVICE r5 #2 (closed for good with flock): N contenders race past
    a dead holder's leftover lock file; kernel flock admits exactly ONE
    into the critical section at a time, so exactly one CAS publish
    succeeds and every other raises CommitConflict. (The earlier
    rename-steal variant raced stat-vs-rename on the lock PATH and let
    two writers in under load — caught by this test in a full-suite
    run.)"""
    import threading

    s = PosixStore()
    base = str(tmp_path)
    g0 = _mkgen(base, "t", 0)
    s.publish(base, "t", g0)
    lock = os.path.join(base, "t.CURRENT.lock")
    with open(lock, "w") as f:
        f.write("99999")  # dead holder's leftovers
    old = time.time() - 3600
    os.utime(lock, (old, old))

    gens = [_mkgen(base, "t", i + 1) for i in range(6)]
    results: list[str] = []
    res_lock = threading.Lock()

    def contend(gen):
        try:
            PosixStore().publish(base, "t", gen, expected=g0)
            with res_lock:
                results.append(gen)
        except CommitConflict:
            pass

    threads = [threading.Thread(target=contend, args=(g,)) for g in gens]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(results) == 1, f"exactly one steal may win, got {results}"
    assert s.resolve(base, "t") == results[0]


def test_two_engines_conflicting_rewrite_fails_loud(spark, tmp_path, monkeypatch):
    """Two engine processes on one base dir (simulated with two backend
    instances): engine 1 resolves the points table, engine 2 commits a
    compaction first, engine 1's publish must raise CommitConflict — not
    silently orphan engine 2's generation (the pre-r5 behavior)."""
    base = str(tmp_path / "db")
    s1, s2 = PosixStore(), PosixStore()
    e1 = BTrDBEngine(spark, base, store_backend=s1)
    u = e1.create_stream("race/a")
    for b in range(2):
        e1.insert(u, [(b * 100 + i, float(i)) for i in range(10)], sync=True)
    e2 = BTrDBEngine(spark, base, store_backend=s2)

    fired = {"done": False}
    orig = s1.publish

    def racing_publish(b, name, gen_path, expected=None):
        if name == "points" and expected is not None and not fired["done"]:
            fired["done"] = True
            e2.compact_points()  # the concurrent writer commits first
        return orig(b, name, gen_path, expected=expected)

    monkeypatch.setattr(s1, "publish", racing_publish)
    with pytest.raises(CommitConflict):
        e1.compact_points()
    # the winner's committed compaction is still live and readable
    assert e1.raw_values(u, 0, 10**9).count() == 20


def test_concurrent_delete_ranges_and_ingest_single_winner(
    spark, tmp_path, monkeypatch
):
    """VERDICT r8 #8: delete_ranges racing a sync insert on the SAME
    stream from another engine process (two backend instances over one
    base dir, ManifestLog CAS). Before the version-slot claim
    (engine._claim_version_slot) both writers computed data-max+1 and
    could stamp a tombstone and an insert with the SAME version; now the
    loser's claim raises CommitConflict BEFORE any tombstone row is
    visible, a retry lands at a strictly higher version, and the
    concurrent insert's points survive untouched."""
    base = str(tmp_path / "db")
    s1, s2 = ManifestLogStore(), ManifestLogStore()
    e1 = BTrDBEngine(spark, base, store_backend=s1)
    u = e1.create_stream("race/dr")
    e1.insert(u, [(i, float(i)) for i in range(10)], sync=True)  # v10
    e2 = BTrDBEngine(spark, base, store_backend=s2)

    fired = {"done": False}
    orig = s1.publish

    def racing_publish(b, name, gen_path, expected=None):
        if name.startswith("ver_") and not fired["done"]:
            fired["done"] = True
            # the concurrent writer commits its insert first (claims v11)
            e2.insert(u, [(100 + i, float(i)) for i in range(5)], sync=True)
        return orig(b, name, gen_path, expected=expected)

    monkeypatch.setattr(s1, "publish", racing_publish)
    with pytest.raises(CommitConflict):
        e1.delete_ranges([(u, 0, 5)])
    # the loser wrote NO tombstone
    assert e1.deletes.filter(F.col("uuid") == u).count() == 0
    # retry on top of the winner succeeds at a strictly higher version
    v_del = e1.delete_ranges([(u, 0, 5)])[u]
    pts = e1.points.filter(F.col("uuid") == u)
    point_versions = sorted(
        r["version"] for r in pts.select("version").distinct().collect()
    )
    assert point_versions == [10, 11]
    assert v_del > max(point_versions)
    # per-stream version monotonicity: no version is shared between a
    # points commit and a delete tombstone
    del_versions = {
        r["version"]
        for r in e1.deletes.filter(F.col("uuid") == u)
        .select("version")
        .distinct()
        .collect()
    }
    assert del_versions == {v_del}
    assert del_versions.isdisjoint(set(point_versions))
    # the concurrent insert survives the delete of [0, 5)
    assert e1.raw_values(u, 0, 10**9).count() == 10 + 5 - 5


def test_concurrent_delete_ranges_both_engines_distinct_versions(
    spark, tmp_path, monkeypatch
):
    """Two delete_ranges on the same stream from two processes: the
    loser conflicts at its claim, retries, and the two tombstones land
    at DISTINCT versions in claim order."""
    base = str(tmp_path / "db")
    s1, s2 = ManifestLogStore(), ManifestLogStore()
    e1 = BTrDBEngine(spark, base, store_backend=s1)
    u = e1.create_stream("race/dd")
    e1.insert(u, [(i, float(i)) for i in range(10)], sync=True)  # v10
    e2 = BTrDBEngine(spark, base, store_backend=s2)

    fired = {"done": False}
    orig = s1.publish

    def racing_publish(b, name, gen_path, expected=None):
        if name.startswith("ver_") and not fired["done"]:
            fired["done"] = True
            e2.delete_ranges([(u, 0, 2)])  # wins v11
        return orig(b, name, gen_path, expected=expected)

    monkeypatch.setattr(s1, "publish", racing_publish)
    with pytest.raises(CommitConflict):
        e1.delete_ranges([(u, 2, 4)])
    v1 = e1.delete_ranges([(u, 2, 4)])[u]  # retry -> v12
    dels = sorted(
        r["version"]
        for r in e1.deletes.filter(F.col("uuid") == u)
        .select("version")
        .collect()
    )
    assert dels == [11, 12] and v1 == 12
    assert e1.raw_values(u, 0, 10**9).count() == 6


@pytest.mark.parametrize(
    "backend",
    [PosixStore, ManifestLogStore, store.InMemoryPointerStore],
)
def test_expect_absent_create_cas_single_winner(tmp_path, backend):
    """ADVICE r9 #2: expected=None is UNCONDITIONAL by contract, so a
    table's very first commit needs the explicit expect-absent mode —
    two writers racing it must get exactly one winner."""
    s = backend()
    base = str(tmp_path)
    ga, gb = _mkgen(base, "t", 0), _mkgen(base, "t", 1)
    s.publish(base, "t", ga, expected=store.EXPECT_ABSENT)  # A wins
    with pytest.raises(CommitConflict):
        s.publish(base, "t", gb, expected=store.EXPECT_ABSENT)
    assert s.resolve(base, "t") == ga
    # crash-after-commit replay of the SAME winning generation succeeds
    s.publish(base, "t", ga, expected=store.EXPECT_ABSENT)
    assert s.resolve(base, "t") == ga
    # normal CAS continues from the created state
    gc = _mkgen(base, "t", 2)
    s.publish(base, "t", gc, expected=ga)
    assert s.resolve(base, "t") == gc


def test_first_commit_claim_race_single_winner(spark, tmp_path, monkeypatch):
    """ADVICE r9 #2 end-to-end: two engine PROCESSES racing a fresh
    stream's FIRST version-bumping commit. Before the expect-absent
    publish mode, _claim_version_slot resolved cur=None and published
    unconditionally — both racers 'won' the same version. Now the loser
    conflicts BEFORE any of its rows are visible and a retry lands at a
    strictly higher version."""
    base = str(tmp_path / "db")
    s1, s2 = ManifestLogStore(), ManifestLogStore()
    e1 = BTrDBEngine(spark, base, store_backend=s1)
    u = e1.create_stream("race/first")
    e2 = BTrDBEngine(spark, base, store_backend=s2)

    fired = {"done": False}
    orig = s1.publish

    def racing_publish(b, name, gen_path, expected=None):
        if name.startswith("ver_") and not fired["done"]:
            fired["done"] = True
            # the OTHER process claims the stream's first version first
            e2.insert(u, [(100 + i, float(i)) for i in range(5)], sync=True)
        return orig(b, name, gen_path, expected=expected)

    monkeypatch.setattr(s1, "publish", racing_publish)
    with pytest.raises(CommitConflict):
        e1.insert(u, [(i, float(i)) for i in range(5)], sync=True)
    # the loser committed NOTHING; the winner's points are intact
    versions = sorted(
        r["version"]
        for r in e1.points.filter(F.col("uuid") == u)
        .select("version")
        .distinct()
        .collect()
    )
    assert len(versions) == 1, "exactly one first-commit winner"
    # retry lands at a strictly higher version
    e1.insert(u, [(i, float(i)) for i in range(5)], sync=True)
    versions2 = sorted(
        r["version"]
        for r in e1.points.filter(F.col("uuid") == u)
        .select("version")
        .distinct()
        .collect()
    )
    assert len(versions2) == 2 and versions2[1] > versions2[0]
    # nothing lost: the loser's first-attempt rows stayed in the hot
    # buffer and committed with the retry's flush (5 winner + 5 buffered
    # first attempt + 5 retry)
    assert e1.raw_values(u, 0, 10**9).count() == 15


def test_flush_holds_engine_write_lock(spark, tmp_path):
    """ADVICE r9 #1 regression guard: flush() must serialize on the
    per-engine write lock — an unlocked flush racing a concurrent
    insert's append_hot can clear hot rows it never committed (silent
    data loss). Asserts the lock is actually taken, not just that the
    decorator is present."""
    import threading

    e = BTrDBEngine(spark, str(tmp_path / "db"))
    u = e.create_stream("lock/flush")
    e.insert(u, [(1, 1.0)])  # buffered, below threshold

    e._write_lock.acquire()
    done = threading.Event()

    def _flush():
        e.flush(u)
        done.set()

    t = threading.Thread(target=_flush, daemon=True)
    t.start()
    time.sleep(0.5)
    assert not done.is_set(), "flush proceeded without the write lock"
    e._write_lock.release()
    t.join(timeout=120)
    assert done.is_set()
    assert e.raw_values(u, 0, 10).count() == 1
