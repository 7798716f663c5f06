"""Streaming sessionization — a stateful gaps-and-islands surface.

The batch engine answers sessionize exactly (gaps-and-islands window,
`__spark_entry__.q_sessionize`); this module is the LIVE surface: a
per-stream session tracker over the ingest feed that emits a session row
the moment an inactivity gap closes it — the alerting/monitoring shape
(device went quiet) that batch recomputation can only deliver a scan
later.

Implementation: ``applyInPandasWithState`` grouped by uuid with
**processing-time timeout** (GroupStateTimeout.ProcessingTimeTimeout):

- state = (session_start, last_time, n_events) for the OPEN session of
  each stream — O(1) per active stream, the same bound as the
  reference's per-stream PQM buffer bookkeeping (pqm.go:29-35);
- a micro-batch folds its (time-sorted) rows: a row more than ``gap`` ns
  after last_time closes the open session (emit it) and opens a new one;
- when a stream goes silent for ``idle_close_ms`` of wall time the
  timeout fires and the open session is emitted as closed — this is a
  deliberate processing-time policy, NOT a watermark: arbitrarily-late
  data still lands correctly in the batch path, and the live view is a
  monitoring surface, not the source of truth (SURVEY.md §2.9).

Output rows: (uuid, session_start, session_end, n_events, closed_by)
with closed_by in {'gap', 'timeout'}.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

SESSION_SCHEMA = StructType(
    [
        StructField("uuid", StringType(), False),
        StructField("session_start", LongType(), False),
        StructField("session_end", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("closed_by", StringType(), False),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("session_start", LongType()),
        StructField("last_time", LongType()),
        StructField("n_events", LongType()),
    ]
)


def _make_update(gap: int, idle_close_ms: int):
    def _update(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (uuid,) = key
        closed: list[tuple[int, int, int, str]] = []
        if state.hasTimedOut:
            if state.exists:
                s, last, n = state.get
                closed.append((s, last, n, "timeout"))
                state.remove()
        else:
            if state.exists:
                s, last, n = state.get
            else:
                s = last = None
                n = 0
            for pdf in pdfs:
                if len(pdf) == 0:
                    continue
                for t in pdf.sort_values("time")["time"]:
                    t = int(t)
                    if s is None:
                        s, last, n = t, t, 1
                    elif t - last > gap:
                        closed.append((s, last, n, "gap"))
                        s, last, n = t, t, 1
                    else:
                        # late/duplicate rows within the gap fold in; the
                        # batch path remains the exact source of truth
                        last = max(last, t)
                        n += 1
            if s is not None:
                state.update((s, last, n))
                state.setTimeoutDuration(idle_close_ms)
        yield pd.DataFrame(
            {
                "uuid": [uuid] * len(closed),
                "session_start": [c[0] for c in closed],
                "session_end": [c[1] for c in closed],
                "n_events": [c[2] for c in closed],
                "closed_by": [c[3] for c in closed],
            }
        )

    return _update


def live_sessions(
    stream_df: DataFrame, gap: int, idle_close_ms: int = 60_000
) -> DataFrame:
    """(uuid, time, value) stream -> closed-session rows. Sink with
    append-mode ``writeStream`` (a session row is final once emitted)."""
    keyed = stream_df.select("uuid", F.col("time").cast("long").alias("time"))
    return keyed.groupBy("uuid").applyInPandasWithState(
        _make_update(gap, idle_close_ms),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
