"""ADVICE r11 #1 / VERDICT r11 #5: shuffle scratch on a RAM-backed tmpfs
must not turn a larger-than-tmpfs working set into a mid-job ENOSPC.
The r12 default pairs the tmpfs dir with a disk dir (Spark round-robins
local dirs per file), so tmpfs holds only ~half the scratch bytes.

This test builds the failure case for real: a 64 MB tmpfs as the "shm"
member of the pair, and a shuffle+sort whose scratch exceeds 64 MB. With
the pair it completes (half the files land on disk); tmpfs alone would
ENOSPC. It needs its own JVM because spark.local.dir is boot-time, and
root to mount the tiny tmpfs — skipped cleanly where either is missing.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

_CHILD = r"""
import sys
sys.path.insert(0, "/root/repo")
import os
from pyspark.sql import SparkSession, functions as F

pair = os.environ["PAIR_DIRS"]
spark = (
    SparkSession.builder.master("local[4]")
    .appName("localdir_pair_test")
    .config("spark.local.dir", pair)
    .config("spark.driver.memory", "1g")
    # force scratch through the local dirs: tiny task memory makes the
    # sort spill, and shuffle compression off keeps the bytes honest
    .config("spark.shuffle.compress", "false")
    .config("spark.shuffle.spill.compress", "false")
    .config("spark.memory.fraction", "0.2")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
# ~82 MB of shuffle payload (750k rows x ~110 B): larger than the 64 MB
# tmpfs (shm-only would ENOSPC) but sized so the ~half Spark hashes onto
# the tmpfs member (~41 MB) fits under its cap. 48 map tasks keep the
# per-file grain small (~1.7 MB), so the per-file dir hashing actually
# balances and the bypass writer's transient temp+merged doubling never
# stacks tens of MB on one device at once.
df = spark.range(750_000, numPartitions=48).select(
    F.col("id"),
    F.concat(F.lit("v" * 100), (F.col("id") % 1000).cast("string")).alias("pad"),
)
out = (
    df.repartition(48, "pad")
    .sortWithinPartitions("pad", "id")
    .groupBy("pad").agg(F.count(F.lit(1)).alias("n"), F.max("id").alias("m"))
)
rows = out.count()
assert rows == 1000, rows
# the tmpfs member really was used — checked BEFORE spark.stop(), which
# deletes the blockmgr scratch dirs on shutdown
shm_member = pair.split(",")[0]
n_shm_files = sum(len(fs) for _r, _d, fs in os.walk(shm_member))
print(f"PAIR_TMPFS_FILES={n_shm_files}")
assert n_shm_files > 0, "tmpfs member of the pair never used"
print("PAIR_SHUFFLE_OK")
spark.stop()
"""


def test_pair_survives_shuffle_larger_than_tmpfs(tmp_path):
    if os.geteuid() != 0:
        pytest.skip("needs root to mount a bounded tmpfs")
    shm = tmp_path / "tinyshm"
    disk = tmp_path / "disk"
    shm.mkdir()
    disk.mkdir()
    r = subprocess.run(
        ["mount", "-t", "tmpfs", "-o", "size=64m", "tmpfs", str(shm)],
        capture_output=True,
    )
    if r.returncode != 0:
        pytest.skip(f"cannot mount tmpfs: {r.stderr.decode()[:200]}")
    try:
        env = dict(os.environ, PAIR_DIRS=f"{shm},{disk}")
        proc = subprocess.run(
            [sys.executable, "-c", _CHILD],
            env=env,
            capture_output=True,
            text=True,
            timeout=600,
        )
        assert "PAIR_SHUFFLE_OK" in proc.stdout, (
            proc.stdout[-2000:] + proc.stderr[-2000:]
        )
    finally:
        subprocess.run(["umount", "-l", str(shm)], capture_output=True)


def test_default_local_dir_is_shm_disk_pair(monkeypatch):
    """The get_spark default pairs shm with a disk dir and honors the
    env override verbatim — checked without building a session (the
    session-scoped fixture already booted the JVM with its own dirs)."""
    from btrdb_spark.session import _default_local_dir

    monkeypatch.delenv("BTRDB_SPARK_LOCAL_DIR", raising=False)
    got = _default_local_dir()
    if got is None:
        pytest.skip("no writable /dev/shm on this host")
    dirs = got.split(",")
    assert dirs[0].startswith("/dev/shm/")
    assert len(dirs) == 2 and not dirs[1].startswith("/dev/shm")
    monkeypatch.setenv("BTRDB_SPARK_LOCAL_DIR", "/x/a,/x/b")
    assert _default_local_dir() == "/x/a,/x/b"  # verbatim override


def test_same_device_pair_collapses_to_shm_only(monkeypatch):
    """VERDICT r12 #5: TMPDIR pointing into /dev/shm would put both
    round-robin halves on one tmpfs — the ENOSPC protection silently
    evaporates. The election must detect the same-st_dev case and
    collapse to the shm member alone (with a warning)."""
    import tempfile

    from btrdb_spark.session import _default_local_dir

    if not (os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK)):
        pytest.skip("no writable /dev/shm on this host")
    monkeypatch.delenv("BTRDB_SPARK_LOCAL_DIR", raising=False)
    monkeypatch.setenv("TMPDIR", "/dev/shm/tmp-alias")
    os.makedirs("/dev/shm/tmp-alias", exist_ok=True)
    tempfile.tempdir = None  # drop the cached gettempdir() result
    try:
        got = _default_local_dir()
    finally:
        tempfile.tempdir = None
        monkeypatch.delenv("TMPDIR", raising=False)
    assert got == "/dev/shm/btrdb-spark-scratch", got
