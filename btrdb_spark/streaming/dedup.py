"""Streaming exact deduplication — first-seen-wins over micro-batches.

The batch pass (functions/dedup.py dedup_exact, one hash groupBy) is the
source of truth for a static corpus; this is the INGEST-TIME variant a
training-data pipeline runs on a document firehose: emit each distinct
content exactly once, the first time it arrives, and drop every later
duplicate — so downstream stages (tokenize/pack/shuffle) never see the
duplicate at all.

Implementation: ``applyInPandasWithState`` keyed by the 64-bit content
hash (xxhash64, the repo-wide shuffle-key convention — raw text never
keys a shuffle). State per distinct content = (keeper doc_id); a group's
first micro-batch emits one row (the smallest doc_id inside that batch,
for intra-batch determinism) and sets the state; later batches emit
nothing. Append-mode output.

Semantics vs batch: batch dedup_exact keeps the globally SMALLEST doc_id;
streaming keeps the FIRST-ARRIVED (ties inside one micro-batch broken by
smallest id). The divergence is inherent to streaming (arrival order is
the only order that exists) and documented here; replaying the same
ordered feed reproduces the same keepers (checkpointed state).

Scale: state is 16 bytes per DISTINCT document — the same cardinality a
batch dedup's shuffle carries; hash-partitioned across executors by the
state store. NoTimeout: exact dedup must remember forever (a bounded
dedup window would use event-time timeout + watermark).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

OUT_SCHEMA = StructType(
    [
        StructField("content_hash", LongType()),
        StructField("doc_id", LongType()),
    ]
)
STATE_SCHEMA = StructType([StructField("keeper", LongType())])


def _first_seen(
    key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        # content already emitted in an earlier batch — drop everything
        return
    best = None
    for pdf in pdfs:
        if len(pdf):
            m = int(pdf["doc_id"].min())
            best = m if best is None else min(best, m)
    if best is None:
        return
    state.update((best,))
    yield pd.DataFrame({"content_hash": [key[0]], "doc_id": [best]})


def streaming_dedup_exact(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, text) stream -> (content_hash, doc_id) append stream of
    first-seen keepers, one row per distinct content ever."""
    keyed = docs.select(
        F.xxhash64(F.col(text_col)).alias("content_hash"),
        F.col(id_col).cast("long").alias("doc_id"),
    )
    return keyed.groupBy("content_hash").applyInPandasWithState(
        _first_seen,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
