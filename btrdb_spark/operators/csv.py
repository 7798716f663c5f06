"""GenerateCSV sink (S6): time-aligned multi-stream CSV export.

Reference (grpcinterface/serve.go:874-1005, csv.go:9-151): one row per
distinct timestamp across the selected streams, three modes (raw /
aligned / windows), optional RFC3339 time rendering, header from stream
labels. Built on the align/windows operators; the writer is Spark's
distributed CSV sink.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.timeops import floor_div
from .align import align_streams
from .windows import aligned_windows, windows


def rfc3339_col(time_col) -> "F.Column":
    """RFC3339 rendering of a ns timestamp column (serve.go:974-975);
    floor (not truncate-toward-zero) so pre-1970 times round the same
    direction as every other ns->bucket conversion (timeops.py)."""
    return F.date_format(
        F.timestamp_micros(floor_div(time_col, F.lit(1000).cast("long"))),
        "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
    )


def csv_raw(
    points: DataFrame,
    uuids: Sequence[str],
    start: int,
    end: int,
    labels: Sequence[str] | None = None,
    rfc3339: bool = True,
    version: int | None = None,
    deletes: DataFrame | None = None,
) -> DataFrame:
    """Raw mode: full-outer time alignment, one value column per stream."""
    labels = list(labels or uuids)
    df = align_streams(points, uuids, start, end, version=version, deletes=deletes)
    cols = [F.col("time")]
    if rfc3339:
        cols.append(rfc3339_col(F.col("time")).alias("time_rfc3339"))
    cols += [F.col(f"v_{u}").alias(lab) for u, lab in zip(uuids, labels)]
    return df.select(*cols)


def csv_windows(
    points: DataFrame,
    uuids: Sequence[str],
    start: int,
    end: int,
    pw: int,
    labels: Sequence[str] | None = None,
    version: int | None = None,
    deletes: DataFrame | None = None,
) -> DataFrame:
    """Aligned-windows mode: per window one (min, mean, max, count) quad per
    stream (csv.go:69-75 column layout)."""
    labels = list(labels or uuids)
    base = None
    stats = aligned_windows(points, None, start, end, pw, version=version, deletes=deletes)
    stats = stats.filter(F.col("uuid").isin(list(uuids)))
    pivots = []
    for u, lab in zip(uuids, labels):
        for c in ("vmin", "vmean", "vmax", "cnt"):
            pivots.append(
                F.max(F.when(F.col("uuid") == F.lit(u), F.col(c))).alias(f"{lab}_{c[1:] if c != 'cnt' else 'count'}")
            )
    return stats.groupBy(F.col("bucket_start").alias("time")).agg(*pivots).orderBy("time")


def csv_windows_arb(
    points: DataFrame,
    uuids: Sequence[str],
    start: int,
    end: int,
    width: int,
    labels: Sequence[str] | None = None,
    version: int | None = None,
    deletes: DataFrame | None = None,
) -> DataFrame:
    """Windows mode (GenerateCSVParams_WINDOWS_QUERY, serve.go:909-923):
    arbitrary-width tumbling windows anchored at `start`, one
    (min, mean, max, count) quad per stream per window (csv.go:69-75).

    All streams share the same (start, width) grid, so the merge-by-earliest-
    time loop of the reference reduces to a pivot on window_start. Zero-count
    holes surface as count=0 rows with NULL stats (the engine's hole
    convention — operators/windows.py)."""
    labels = list(labels or uuids)
    scoped = points.filter(F.col("uuid").isin(list(uuids)))
    stats = windows(scoped, None, start, end, width, version=version, deletes=deletes)
    pivots = []
    for u, lab in zip(uuids, labels):
        for c, suffix in (("vmin", "min"), ("vmean", "mean"), ("vmax", "max"), ("cnt", "count")):
            pivots.append(
                F.max(F.when(F.col("uuid") == F.lit(u), F.col(c))).alias(f"{lab}_{suffix}")
            )
    return stats.groupBy(F.col("window_start").alias("time")).agg(*pivots).orderBy("time")


def write_csv(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").option("header", "true").csv(path)
