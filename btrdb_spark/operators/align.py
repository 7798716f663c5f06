"""Multi-stream time alignment (S6 GenerateCSV / J1).

Reference semantics (grpcinterface/serve.go:874-1005, csv.go:9-151): a k-way
full-outer sorted merge across streams — one output row per distinct
timestamp, with each selected stream contributing its value (empty cell when
the stream has no point at that timestamp).

Spark-first expression: conditional aggregation (groupBy time + one
max(when(...)) per stream) instead of k-1 chained full-outer joins — ONE
shuffle total regardless of k, map-side combinable, and identical output.
Within a stream, duplicate timestamps collapse deterministically to the max
value (the reference emits one row per duplicate in stored order; documented
divergence — duplicates across a CSV align are pathological).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .raw import apply_deletes, at_version


def align_streams(
    points: DataFrame,
    uuids: Sequence[str],
    start: int,
    end: int,
    version: int | None = None,
    deletes: DataFrame | None = None,
    key_col: str = "uuid",
) -> DataFrame:
    """One row per distinct time in [start, end); one value column per stream."""
    df = apply_deletes(at_version(points, version), deletes, version)
    df = df.filter(F.col(key_col).isin(list(uuids)))
    df = df.filter((F.col("time") >= F.lit(start)) & (F.col("time") < F.lit(end)))
    aggs = [
        F.max(F.when(F.col(key_col) == F.lit(u), F.col("value"))).alias(f"v_{u}")
        for u in uuids
    ]
    return df.groupBy("time").agg(*aggs).orderBy("time")
