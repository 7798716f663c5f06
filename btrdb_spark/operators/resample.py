"""Resampling and differentiation over irregular telemetry.

Neither exists in the reference (its stat windows aggregate, they don't
interpolate — SURVEY §2.4); both are staples of the workloads BTrDB
serves (synchrophasor alignment, rate-of-change alarms):

- ``resample_locf``: last-observation-carried-forward onto a regular
  grid — a direct composition of the batched as-of join (one window
  pass; grid cells before a stream's first point stay NULL rather than
  inventing data).
- ``stream_rate``: per-stream discrete derivative between consecutive
  points (lag window). Duplicate timestamps are ordered by value for a
  deterministic lag, and zero-dt pairs are dropped rather than emitting
  inf — both rules mirrored in the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .asof import asof_join

NS_PER_SEC = 1_000_000_000


def resample_locf(
    points: DataFrame,
    uuids: DataFrame,
    start: int,
    end: int,
    width: int,
    chunk_width: int | None = None,
) -> DataFrame:
    """(uuid, grid_time, last_time, value): LOCF sample of each stream in
    ``uuids`` at grid_time = start + k*width for k in [0, (end-start)/width).

    Inclusive as-of (time <= grid_time): a point exactly on the grid is
    its own sample. One window shuffle; the grid generation is a
    broadcast cross join against a `spark.range` (no driver loop).
    ``chunk_width`` opts into the skew-safe two-pass as-of plan (see
    asof_join) for pathological single-stream volumes.
    """
    n = (end - start) // width
    grid = points.sparkSession.range(n).select(
        (F.lit(start) + F.col("id") * F.lit(width)).alias("t")
    )
    probes = uuids.select("uuid").crossJoin(F.broadcast(grid))
    out = asof_join(points, probes, forward=False, strict=False, chunk_width=chunk_width)
    return out.select(
        "uuid",
        F.col("t").alias("grid_time"),
        F.col("asof_time").alias("last_time"),
        F.col("asof_value").alias("value"),
    ).orderBy("uuid", "grid_time")


def resample_locf_oracle_sql(points_sql: str, uuids_sql: str, start: int, end: int, width: int) -> str:
    from .asof import asof_oracle_sql

    n = (end - start) // width
    probes = (
        f"(SELECT uuid, CAST({start} AS BIGINT) + gs.generate_series * {width} AS t "
        f"FROM {uuids_sql} u CROSS JOIN generate_series(0, {n - 1}) gs)"
    )
    inner = asof_oracle_sql(points_sql, probes, forward=False, strict=False)
    return (
        f"SELECT uuid, t AS grid_time, asof_time AS last_time, asof_value AS value "
        f"FROM ({inner}) q ORDER BY uuid, grid_time"
    )


def stream_rate(points: DataFrame) -> DataFrame:
    """(uuid, time, rate_per_sec): (v - v_prev) * 1e9 / (t - t_prev) per
    stream, consecutive points by (time, value) order; zero-dt dropped."""
    w = Window.partitionBy("uuid").orderBy("time", "value")
    df = points.select(
        "uuid",
        "time",
        "value",
        F.lag("time").over(w).alias("pt"),
        F.lag("value").over(w).alias("pv"),
    ).filter(F.col("pt").isNotNull() & (F.col("time") > F.col("pt")))
    rate = (F.col("value") - F.col("pv")) * F.lit(float(NS_PER_SEC)) / (
        F.col("time") - F.col("pt")
    )
    return df.select("uuid", "time", rate.alias("rate_per_sec")).orderBy(
        "uuid", "time", "rate_per_sec"
    )


def stream_rate_oracle_sql(points_sql: str) -> str:
    return f"""
        WITH l AS (
            SELECT uuid, time, value,
                   LAG(time)  OVER (PARTITION BY uuid ORDER BY time, value) AS pt,
                   LAG(value) OVER (PARTITION BY uuid ORDER BY time, value) AS pv
            FROM {points_sql} p
        )
        SELECT uuid, time,
               (value - pv) * 1000000000.0 / (time - pt) AS rate_per_sec
        FROM l WHERE pt IS NOT NULL AND time > pt
        ORDER BY uuid, time, rate_per_sec
    """
