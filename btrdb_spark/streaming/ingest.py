"""Structured Streaming ingest — the journaled-buffer (PQM/S2) analog.

Reference semantics (pqm.go:29-35, 510-625): inserts are journaled and
buffered per stream; queries at latest see the buffer merged in; a flush
(or buffer pressure) commits the buffer to primary storage at major+1.
There is NO watermark: data may be arbitrarily late (SURVEY.md §2.9), so
correctness-critical aggregation happens at read/compaction time, never in
streaming window state.

Spark mapping:
- ``readStream`` on a source -> ``foreachBatch`` append into the engine's
  hot table. The streaming checkpoint is the WAL: a batch is acked only
  after its parquet commit (at-least-once), and a committed-epoch marker
  makes replay after failure skip epochs whose data commit completed —
  the version-guarded journal replay of pqm.go:152-188. The residual
  window (crash between the data commit and the marker write) re-appends
  one batch; closing it entirely requires a transactional table format
  (Delta/Iceberg txn appends keyed by (queryId, epochId)), which is what
  this sink becomes on a cluster.
- Flush/compaction runs inside the same foreachBatch once a stream's
  buffer exceeds the threshold — exactly the reference's size-triggered
  commit (pqm.go:568-600). The per-stream count check is bounded: one row
  per active stream in the micro-batch, never the whole buffer.
- Optionally each batch also appends rollup-ladder partials
  (plans/rollup.py), which is how the materialized rollup stays fresh
  under continuous ingest. The ladder here must NOT be the engine's own
  ladder: engine.flush() ingests the flushed batch into engine.ladder at
  its commit version, so wiring the same ladder in both places would
  double-count every point (guarded below).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..engine import BTrDBEngine
from ..plans.rollup import RollupLadder

# Streaming rows live in their own seq namespace. engine.insert() stamps
# seq from the per-stream buffered minor counter (engine.py:489 — small
# ints 0,1,2,...), which would collide with small micro-batch epoch ids:
# a first-time batch whose epoch_id matched any buffered insert seq would
# be treated as a replay and silently dropped from the hot table. The
# offset is far above any reachable minor (minor < flush_threshold +
# MAX_INSERT_SIZE << 2^61) and far below int64 overflow for any
# realistic epoch count.
STREAM_SEQ_BASE = 1 << 61


def attach_ingest(
    stream_df: DataFrame,
    engine: BTrDBEngine,
    checkpoint_dir: str,
    ladder: RollupLadder | None = None,
    trigger_seconds: int = 1,
    maintenance_interval_s: float | None = None,
    vacuum_keep: int = 2,
):
    """Wire a streaming (uuid, time, value) DataFrame into the engine.

    ``maintenance_interval_s`` arms the background GC loop (the
    quasar.go:119-137 analog, which the reference runs on a 1-minute
    ticker): at most once per interval, after the batch's commits, the
    trigger calls engine.maintain(keep=vacuum_keep) to reap superseded
    table generations. Readers within the newest ``vacuum_keep``
    generations survive a concurrent reap (the MVCC window). Compaction
    is intentionally NOT run per-trigger — call engine.maintain(
    compact=True) at a coarser cadence.

    Returns the StreamingQuery. Caller owns awaitTermination/stop.
    """
    if ladder is not None and ladder is engine.ladder:
        raise ValueError(
            "pass ladder=None: engine.flush() already maintains engine.ladder "
            "at commit time; wiring it here too would double-count every batch"
        )
    process_batch = make_batch_processor(
        engine,
        checkpoint_dir,
        ladder=ladder,
        maintenance_interval_s=maintenance_interval_s,
        vacuum_keep=vacuum_keep,
    )
    return (
        stream_df.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )


def make_batch_processor(
    engine: BTrDBEngine,
    checkpoint_dir: str,
    ladder: RollupLadder | None = None,
    maintenance_interval_s: float | None = None,
    vacuum_keep: int = 2,
):
    """The foreachBatch body, exposed so crash/replay semantics are
    directly testable (tests/test_streaming_ladder_chaos.py drives it
    with crafted epochs and injected kills).

    Exactly-once across replays (scoped: assumes the parquet append
    itself is all-or-nothing — Spark's job-level commit protocol on a
    normal run. A hard kill INSIDE the append job can leave a partially
    visible append that the existence probe then pins; closing that
    residual window takes a transactional table format, per the module
    docstring):
    - hot table: rows carry seq=STREAM_SEQ_BASE+epoch_id (a namespace
      disjoint from insert()'s minor-counter seqs, so mixed insert()+
      streaming traffic can't fake a replay); a replayed epoch whose
      rows already landed is detected with one pruned existence probe
      over the batch's own uuids and skipped;
    - ladder: ingest_batch(epoch=...) guards each level with an atomic
      per-level epoch watermark (plans/rollup.py) — a kill between the
      hot append and the ladder merge, or between any two level appends,
      replays into appends of only the missing levels;
    - the epoch .done marker then gates the whole batch; flush/GC after
      it are version-guarded engine ops, safe to repeat.
    """
    marker_dir = os.path.join(checkpoint_dir, "committed_epochs")
    os.makedirs(marker_dir, exist_ok=True)
    last_maintain = [float("-inf")]  # monotonic seconds of the last GC run

    def process_batch(batch: DataFrame, epoch_id: int) -> None:
        marker = os.path.join(marker_dir, f"{epoch_id}.done")
        if os.path.exists(marker):
            return  # crashed-then-replayed epoch: data commit already done
        seq = STREAM_SEQ_BASE + epoch_id
        batch = batch.select(
            "uuid",
            F.col("time").cast("long"),
            F.col("value").cast("double"),
            F.lit(seq).cast("long").alias("seq"),
        )
        touched = [r["uuid"] for r in batch.select("uuid").distinct().collect()]
        hot_done = (
            engine.hot.filter(
                F.col("uuid").isin(touched) & (F.col("seq") == seq)
            )
            .limit(1)
            .count()
            > 0
        )
        if not hot_done:
            engine.append_hot(batch)
        if ladder is not None:
            ladder.ingest_batch(batch.select("uuid", "time", "value"), epoch=epoch_id)
        # atomic marker AFTER the data commit (write tmp + rename)
        tmp = marker + ".tmp"
        with open(tmp, "w") as f:
            f.write("ok")
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, marker)
        # bound the marker set: replay can only revisit epochs still in the
        # streaming checkpoint's recent window, so markers far behind the
        # current epoch are dead weight (keep a generous 1000)
        for fn in os.listdir(marker_dir):
            if fn.endswith(".done") and int(fn[:-5]) < epoch_id - 1000:
                os.unlink(os.path.join(marker_dir, fn))
        # size-triggered flush per stream (pqm.go:568-600); only streams
        # present in THIS batch can have crossed the threshold
        counts = (
            engine.hot.filter(F.col("uuid").isin(touched))
            .groupBy("uuid")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") >= engine.flush_threshold)
            .collect()
        )
        for row in counts:
            engine.flush(row["uuid"])
        # interval-throttled background GC (quasar.go:119-137 ticker
        # analog): reap generations older than the vacuum_keep MVCC window
        if maintenance_interval_s is not None:
            import time as _time

            now = _time.monotonic()
            if now - last_maintain[0] >= maintenance_interval_s:
                last_maintain[0] = now
                engine.maintain(keep=vacuum_keep)

    return process_batch
