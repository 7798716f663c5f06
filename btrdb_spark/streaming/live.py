"""Live statistical view — a streaming AlignedWindows surface.

The reference has no watermark concept: late data is first-class, so the
batch engine (hot∪cold + rollup ladder) is the source of truth for exact
answers (SURVEY.md §2.9). This module adds the *optional live view* the
survey allows: a continuously-updated (uuid, bucket) -> StatPoint stream
over the ingest feed, for dashboards that want sub-second freshness
without querying storage.

Implementation: ``applyInPandasWithState`` — Spark's arbitrary-stateful
operator (the Structured Streaming analog of the reference's in-memory
per-stream buffer stats, merger.go:212-247 CreateStatWindows):

- grouped by (uuid, bucket_start); state = (cnt, vmin, vmax, vsum);
- every micro-batch folds its rows into the state with the same exact
  combine as the rollup ladder (count/min/max/sum) and emits the updated
  StatPoint — update-mode output, cost ∝ touched buckets per batch;
- NO timeout/eviction: a bucket's state must accept arbitrarily late
  points forever (no-watermark contract). State size = active buckets;
  for bounded state at 100 TB scale, point the view at a coarse pw and
  let the batch ladder serve fine grains.

The view is eventually-consistent with the batch path by construction:
both fold the identical commutative/associative combine, so a bucket's
live row equals the ladder row once the same points have arrived.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.timeops import bucket_start

STAT_SCHEMA = StructType(
    [
        StructField("uuid", StringType(), False),
        StructField("bucket_start", LongType(), False),
        StructField("cnt", LongType(), False),
        StructField("vmin", DoubleType(), True),
        StructField("vmean", DoubleType(), True),
        StructField("vmax", DoubleType(), True),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("cnt", LongType()),
        StructField("vmin", DoubleType()),
        StructField("vmax", DoubleType()),
        StructField("vsum", DoubleType()),
    ]
)


def _update(
    key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    uuid, bstart = key
    if state.exists:
        cnt, vmin, vmax, vsum = state.get
    else:
        cnt, vmin, vmax, vsum = 0, None, None, 0.0
    for pdf in pdfs:
        vals = pdf["value"]
        if len(vals) == 0:
            continue
        cnt += int(len(vals))
        bmin, bmax = float(vals.min()), float(vals.max())
        vmin = bmin if vmin is None else min(vmin, bmin)
        vmax = bmax if vmax is None else max(vmax, bmax)
        vsum += float(vals.sum())
    state.update((cnt, vmin, vmax, vsum))
    yield pd.DataFrame(
        {
            "uuid": [uuid],
            "bucket_start": [bstart],
            "cnt": [cnt],
            "vmin": [vmin],
            "vmean": [vsum / cnt if cnt else None],
            "vmax": [vmax],
        }
    )


def live_stat_view(stream_df: DataFrame, pw: int) -> DataFrame:
    """(uuid, time, value) stream -> continuously updated StatPoints at
    2^pw grain. Returns a streaming DataFrame; sink it with update-mode
    ``writeStream`` (memory/console for dashboards, or foreachBatch)."""
    width = 1 << pw
    keyed = stream_df.select(
        "uuid",
        bucket_start(F.col("time").cast("long"), width).alias("bucket_start"),
        F.col("value").cast("double").alias("value"),
    )
    return keyed.groupBy("uuid", "bucket_start").applyInPandasWithState(
        _update,
        outputStructType=STAT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
