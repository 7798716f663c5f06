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
  after its parquet commit, and replay after failure is idempotent per
  epoch id (at-least-once + idempotent sink = the reference's
  version-guarded journal replay, pqm.go:152-188).
- Flush/compaction runs inside the same foreachBatch once a stream's
  buffer exceeds the threshold — exactly the reference's size-triggered
  commit (pqm.go:568-600).
- Optionally each batch also appends rollup-ladder partials
  (plans/rollup.py), which is how the materialized rollup stays fresh
  under continuous ingest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..engine import BTrDBEngine
from ..plans.rollup import RollupLadder


def attach_ingest(
    stream_df: DataFrame,
    engine: BTrDBEngine,
    checkpoint_dir: str,
    ladder: RollupLadder | None = None,
    trigger_seconds: int = 1,
):
    """Wire a streaming (uuid, time, value) DataFrame into the engine.

    Returns the StreamingQuery. Caller owns awaitTermination/stop.
    """

    def process_batch(batch: DataFrame, epoch_id: int) -> None:
        batch = batch.select(
            "uuid",
            F.col("time").cast("long"),
            F.col("value").cast("double"),
            F.lit(epoch_id).cast("long").alias("seq"),
        )
        batch.write.mode("append").parquet(engine._path("hot"))
        if ladder is not None:
            ladder.ingest_batch(batch.select("uuid", "time", "value"))
        # size-triggered flush per stream (pqm.go:568-600)
        counts = (
            engine.hot.groupBy("uuid").agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") >= engine.flush_threshold)
            .collect()
        )
        for row in counts:
            engine.flush(row["uuid"])

    return (
        stream_df.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )
