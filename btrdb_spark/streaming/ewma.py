"""Streaming per-stream EWMA — the live twin of operators.resample.ewma.

The batch recurrence e_i = (1-a)*e_{i-1} + a*x_i needs the previous
OUTPUT, so the streaming form is stateful: applyInPandasWithState keyed
by uuid carries (count, last ewma) across micro-batches, each batch's
rows folded in (time, value) order from the carried state — the same
expression shape as the batch kernel, so for per-stream IN-ORDER arrival
the live view equals the batch answer row-for-row and a replay from a
fresh checkpoint is identical (state is a pure function of the prefix).

Ordering contract: the engine has no watermark (data may be arbitrarily
late — SURVEY §2.9); a recurrence is order-sensitive, so a late point
invalidates downstream live values. This operator is the MONITORING view
for live, in-order telemetry; the batch operator over the committed
table stays the exact source of truth after late arrivals (the same
split as live_stat_view vs the rollup ladder).

State: two doubles + a long per stream — O(streams), not O(points).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def live_ewma(stream_df: DataFrame, alpha: float = 0.25) -> DataFrame:
    """(uuid, time, value) stream -> (uuid, time, value, ewma) rows,
    one per input row, ewma carried across micro-batches per uuid."""
    a = float(alpha)

    def fold(
        key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        rows = pd.concat(list(pdfs))
        if rows.empty:
            return
        # a group's micro-batch arrives as unordered Arrow chunks: one
        # sort over the whole batch (the sessionizer lesson)
        rows = rows.sort_values(["time", "value"], kind="mergesort")
        if state.exists:
            (_n, prev) = state.get
            have = True
        else:
            prev, have = 0.0, False
        out = []
        for x in rows["value"].to_numpy():
            if not have:
                prev, have = float(x), True
            else:
                prev = (1.0 - a) * prev + a * float(x)
            out.append(prev)
        n = (state.get[0] if state.exists else 0) + len(out)
        state.update((n, prev))
        yield rows.assign(ewma=out)[["uuid", "time", "value", "ewma"]]

    return (
        stream_df.select("uuid", "time", "value")
        .groupBy("uuid")
        .applyInPandasWithState(
            fold,
            outputStructType="uuid string, time long, value double, ewma double",
            stateStructType="n long, last double",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
