"""Live CUSUM drift alarms — the streaming face of
operators/resample.py cusum_alarms.

Fixed-target mode only (Page's original procedure): a live stream has no
final mean, so the target mu is a parameter — the commissioning value or
setpoint the fleet watches deviations from. State per stream = the two
running statistics (pos, neg); each micro-batch folds its rows in event
order with the SAME expression shapes as the batch kernel
(`s + (x - mu - k)`, `max(0, .)`, reset on alarm), so on an in-order feed
the live alarms equal `cusum_alarms(..., target=mu)` row-for-row
(tests/test_streaming_cusum.py).

Out-of-order caveat (the no-watermark contract): a late point changes
every subsequent CUSUM value, which no bounded-state stream can replay —
the batch operator over committed storage stays the source of truth;
this view exists for sub-second alarm latency on live feeds.

Scale: state is two doubles per stream, keyed by uuid across executors.
Append-mode output: one row per fired alarm.
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

OUT_SCHEMA = StructType(
    [
        StructField("uuid", StringType()),
        StructField("time", LongType()),
        StructField("value", DoubleType()),
        StructField("direction", StringType()),
        StructField("stat", DoubleType()),
    ]
)
STATE_SCHEMA = StructType(
    [StructField("pos", DoubleType()), StructField("neg", DoubleType())]
)


def _make_update(mu: float, k: float, h: float):
    def _update(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (uuid,) = key
        pos, neg = state.get if state.exists else (0.0, 0.0)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            state.update((pos, neg))
            return
        rows = pd.concat(chunks, ignore_index=True).sort_values(
            ["time", "value"], kind="mergesort"
        )
        out_t, out_v, out_d, out_s = [], [], [], []
        for t, x in zip(rows["time"].to_numpy(), rows["value"].to_numpy()):
            x = float(x)
            pos = max(0.0, pos + (x - mu - k))
            neg = max(0.0, neg + (mu - x - k))
            if pos > h:
                out_t.append(int(t)); out_v.append(x)
                out_d.append("up"); out_s.append(pos)
                pos = 0.0
            if neg > h:
                out_t.append(int(t)); out_v.append(x)
                out_d.append("down"); out_s.append(neg)
                neg = 0.0
        state.update((pos, neg))
        if out_t:
            yield pd.DataFrame(
                {"uuid": uuid, "time": out_t, "value": out_v,
                 "direction": out_d, "stat": out_s}
            )

    return _update

def live_cusum(
    stream_df: DataFrame, mu: float, k: float = 8.0, h: float = 64.0
) -> DataFrame:
    """(uuid, time, value) stream -> append stream of CUSUM alarms
    against the fixed target ``mu``."""
    keyed = stream_df.select(
        F.col("uuid").cast("string").alias("uuid"),
        F.col("time").cast("long").alias("time"),
        F.col("value").cast("double").alias("value"),
    )
    return keyed.groupBy("uuid").applyInPandasWithState(
        _make_update(float(mu), float(k), float(h)),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
