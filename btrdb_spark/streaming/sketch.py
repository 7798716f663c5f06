"""Streaming KMV distinct sketch — bounded-state cardinality over an
unbounded stream.

The batch sketch (functions/sketches.py distinct_kmv) answers "how many
distinct keys" with k longs of state per group; this is its ingest-time
sibling: per-group state is the SAME bottom-k hash set, folded forward
across micro-batches (bottom-k(state ∪ batch) — the KMV merge law, so
the streaming state after N batches is bit-identical to the batch
sketch over their union; the test pins exactly that equality).
Where streaming_dedup_exact's state grows with distinct cardinality,
this stays at k longs per group FOREVER — the sketch is the part you
keep when exact streaming state stops fitting.

``applyInPandasWithState`` keyed by the group column; update-mode
output re-emits a group's row whenever a batch touches it, carrying the
current estimate — the live-dashboard read (distinct users per day so
far). Estimator identical to the batch side: n < k → exact n, else
(k-1)·2^60 / kth_min.

Reference framing: the reference keeps per-stream aggregates hot in the
PQM buffer (pqm.go); this extends the same fold-forward idea to a
cardinality aggregate that has no exact bounded form.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.sketches import H_SPAN

OUT_SCHEMA = StructType(
    [
        StructField("group", StringType()),
        StructField("est_distinct", DoubleType()),
        StructField("n_sketch", LongType()),
    ]
)
STATE_SCHEMA = StructType([StructField("bottom", ArrayType(LongType()))])


def _kmv_fold(k: int):
    def fold(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        cur = set(state.get[0]) if state.exists else set()
        for pdf in pdfs:
            cur.update(int(h) for h in pdf["h"])
        bottom = sorted(cur)[:k]
        state.update((bottom,))
        n = len(bottom)
        # same estimator as the batch sketch (sketches.distinct_kmv)
        est = float(n) if n < k else (k - 1) * H_SPAN / float(bottom[-1])
        yield pd.DataFrame(
            {"group": [key[0]], "est_distinct": [est], "n_sketch": [n]}
        )

    return fold


def streaming_distinct_kmv(
    stream: DataFrame, group_col: str, key_col: str, k: int = 256
) -> DataFrame:
    """Keyed stream -> update stream of (group, est_distinct, n_sketch),
    one row per touched group per micro-batch, state = k longs/group."""
    keyed = stream.select(
        F.col(group_col).cast("string").alias("group"),
        F.conv(
            F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10
        ).cast("long").alias("h"),
    )
    return keyed.groupBy("group").applyInPandasWithState(
        _kmv_fold(k),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
