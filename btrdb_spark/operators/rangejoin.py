"""Range (interval) join: points against a table of time ranges.

The reference has no interval join (its only predicate is one time range
per query — SURVEY §2.2); this is the set-oriented generalization a
fleet-analytics workload needs: "annotate every point with the
maintenance windows / fault events it falls inside".

Scale design — bucket-expansion equi-join, NOT a theta join: a naive
``points JOIN ranges ON time BETWEEN start AND end`` has no equi-key, so
Spark must pick BroadcastNestedLoop (OK only for tiny ranges) or a
cartesian (never OK). Instead each range explodes to the 2^pw buckets it
covers and the join runs as an equi-join on the bucket id with the
range predicate as a residual filter. The join key cardinality grows
with the time span, so partitions stay balanced; when the exploded
ranges side is small Spark still broadcasts it (audited). Pick pw near
the median range width: too fine explodes ranges, too coarse inflates
the residual-filtered candidate set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from btrdb_spark.functions.timeops import floor_div


def range_join(points: DataFrame, ranges: DataFrame, pw: int = 40) -> DataFrame:
    """ranges(range_id, start, end) x points(uuid, time, value) ->
    one row per (point, containing range), half-open [start, end)."""
    w = F.lit(1 << pw)
    exploded = ranges.select(
        "range_id",
        "start",
        "end",
        F.explode(
            F.sequence(floor_div(F.col("start"), w), floor_div(F.col("end") - 1, w))
        ).alias("bucket"),
    )
    pts = points.select(
        "uuid", "time", "value", floor_div(F.col("time"), w).alias("bucket")
    )
    return (
        pts.join(exploded, "bucket")
        .filter((F.col("time") >= F.col("start")) & (F.col("time") < F.col("end")))
        .select("range_id", "uuid", "time", "value")
    )


def range_join_agg(points: DataFrame, ranges: DataFrame, pw: int = 40) -> DataFrame:
    """Per (range_id, uuid) stats of the points inside each range —
    the StatPoint shape (count/min/mean/max) over range membership."""
    from btrdb_spark.operators.windows import _stat_aggs, _with_vmean

    return (
        _with_vmean(
            range_join(points, ranges, pw)
            .groupBy("range_id", "uuid")
            .agg(*_stat_aggs())
        )
        .select("range_id", "uuid", "cnt", "vmin", "vmean", "vmax")
        .orderBy("range_id", "uuid")
    )


def range_join_agg_oracle_sql(points_sql: str, ranges_sql: str, mean_sql: str) -> str:
    """DuckDB mirror — the oracle can use the plain theta join (DuckDB's
    IEJoin handles intervals natively); results must match the
    bucket-expansion plan exactly."""
    return f"""
        SELECT r.range_id, p.uuid, COUNT(*) AS cnt,
               MIN(p.value) AS vmin, {mean_sql} AS vmean, MAX(p.value) AS vmax
        FROM {points_sql} p JOIN {ranges_sql} r
          ON p.time >= r.start AND p.time < r.end
        GROUP BY 1, 2 ORDER BY 1, 2
    """
