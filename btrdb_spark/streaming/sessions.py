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

# The watermark clock runs on epoch-MS timestamps derived from the ns event
# time, shifted forward by ~278 years: Spark's initial watermark is 0 and its
# late-row filter drops rows with ev_ts <= watermark, so an unshifted clock
# would silently discard events in the first epoch millisecond (and any
# pre-1970 event time, which the reference's time domain allows —
# qtree/qtree.go MinimumTime is 1933). The offset cancels out in the
# session rows themselves, which carry raw ns times only.
WATERMARK_OFFSET_MS = 1 << 43  # ~2248 CE; covers event times back to ~1692

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
            # A group's micro-batch may arrive as several Arrow chunks in
            # arbitrary order (the shuffle does not preserve time order), so
            # the fold must run over ALL rows sorted once — per-chunk sorting
            # would let an out-of-order chunk boundary spuriously split a
            # session or record a too-late session_start.
            chunks = [pdf for pdf in pdfs if len(pdf)]
            rows = (
                pd.concat(chunks, ignore_index=True) if chunks else pd.DataFrame({"time": []})
            )
            for t in rows.sort_values("time")["time"]:
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


def _make_update_event_time(gap: int):
    def _update(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (uuid,) = key
        closed: list[tuple[int, int, int, str]] = []
        if state.hasTimedOut:
            if state.exists:
                s, last, n = state.get
                closed.append((s, last, n, "watermark"))
                state.remove()
        else:
            if state.exists:
                s, last, n = state.get
            else:
                s = last = None
                n = 0
            chunks = [pdf for pdf in pdfs if len(pdf)]
            rows = (
                pd.concat(chunks, ignore_index=True) if chunks else pd.DataFrame({"time": []})
            )
            for t in rows.sort_values("time")["time"]:
                t = int(t)
                if s is None:
                    s, last, n = t, t, 1
                elif t - last > gap:
                    closed.append((s, last, n, "gap"))
                    s, last, n = t, t, 1
                else:
                    last = max(last, t)
                    n += 1
            if s is not None:
                state.update((s, last, n))
                # Close when the event-time watermark passes last + gap, on
                # the same offset ms clock as the watermark column. Ceil so
                # the timeout can never fire a ms early; clamp above the
                # current watermark (Spark rejects timeout <= watermark when
                # allowed lateness let older-than-watermark data in).
                close_ms = -(-(last + gap) // 1_000_000) + WATERMARK_OFFSET_MS + 1
                state.setTimeoutTimestamp(max(close_ms, state.getCurrentWatermarkMs() + 1))
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


def streaming_session_window_stats(
    stream_df: DataFrame, gap_ns: int = 1_800_000_000_000,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """The batch `session_window_stats` aggregation run STATEFUL (verdict
    r7 ask #5): builds the µs-truncated ts column, attaches the event-time
    watermark, and applies the IDENTICAL `session_window_agg` expression
    from functions/analytics.py — n_types is size(collect_set(...)) in
    both modes, so every aggregate is streaming-legal. Sink in APPEND
    mode: a session row is emitted exactly once, when the watermark
    passes its close; closed rows are bit-equal to the batch query's rows
    for the same events (tests/test_streaming_session_window.py).
    """
    from ..functions.analytics import session_window_agg

    keyed = stream_df.select(
        "user_id",
        F.timestamp_micros(F.expr("time_ns div 1000")).alias("ts"),
        "event_type",
        "value",
    ).withWatermark("ts", watermark_delay)
    return session_window_agg(keyed, gap_ns)


def live_sessions_event_time(
    stream_df: DataFrame, gap: int, watermark_delay: str = "0 seconds"
) -> DataFrame:
    """Event-time sessionizer: sessions close by EVENT-time gap, not wall
    time, so a replay of the same input produces the identical session set
    — and every closed session (start, end, n_events) matches the batch
    gaps-and-islands answer (`sessionize`) exactly.

    Mechanics: watermark over timestamp_micros(time/1000) with
    ``watermark_delay`` lateness allowance; EventTimeTimeout fires when the
    watermark passes last_time + gap, closing the open session
    (closed_by='watermark'); in-batch gap splits are pure event-time folds
    (closed_by='gap'). Either way the emitted (start, end, n) triple is
    event-time-only, so the union of closed sessions is replay-stable —
    unlike `live_sessions`, whose idle close depends on wall-clock arrival.

    The final open session per stream closes only when the watermark
    advances past it (i.e. newer data arrives on ANY stream) — the standard
    structured-streaming contract for append-mode session windows.
    """
    t = F.col("time").cast("long")
    ev_ms = F.floor(t / F.lit(1_000_000)) + F.lit(WATERMARK_OFFSET_MS)
    keyed = stream_df.select(
        "uuid",
        t.alias("time"),
        F.timestamp_millis(ev_ms.cast("long")).alias("ev_ts"),
    ).withWatermark("ev_ts", watermark_delay)
    return keyed.groupBy("uuid").applyInPandasWithState(
        _make_update_event_time(gap),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
