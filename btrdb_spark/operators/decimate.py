"""Min/max plot decimation — the reference ecosystem's visualization read.

The reference's flagship consumer (the Mr. Plotter web frontend) renders
billion-point streams by asking for StatPoints at a pointwidth matched to
the screen resolution and drawing the min/max envelope per pixel column
(the multi-resolution query purpose stated in the FAST'16 paper and
README.md:24-26; served by AlignedWindows, quasar.go:266-310). StatPoints
lose WHERE inside the window the extremes sit; plotting tools that draw
connected lines instead want the classic min/max decimation: the actual
raw points that attain the bucket minimum and maximum, so the drawn
polyline touches every extreme the screen can show.

This operator returns those points: for each (stream, 2^pw bucket) the
earliest point attaining the bucket minimum and the earliest point
attaining the bucket maximum (one row only when a single point is both —
a one-point bucket). Output size is <= 2 rows per on-screen bucket,
independent of the underlying point count.

Plan shape / 100 TB notes: a single map-side-combinable groupBy on
(uuid, bucket) — the extremes are computed as ``min(struct(value,time))``
and ``max(struct(value,-time))`` so the whole reduction stays in one
shuffle with partial aggregation, no window functions and no second pass.
The struct min/max is order-independent, so the answer is deterministic
under any partitioning. Filters on uuid/time prune partitions before the
shuffle. At plotting pointwidths coarser than a maintained rollup level,
the candidate set could first be narrowed by the ladder's per-bucket
min/max (read rollup, then fetch only buckets on screen) — the operator
body is the same groupBy either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.timeops import bucket_start


def decimate_minmax(
    points: DataFrame,
    start: int | None = None,
    end: int | None = None,
    pw: int = 42,
) -> DataFrame:
    """Per-(uuid, 2^pw bucket) min/max envelope points.

    Output: (uuid, time, value) — the earliest point attaining the bucket
    min and the earliest attaining the bucket max; a single row when one
    point is both. Deterministic: ties on value break to the earliest
    timestamp on BOTH extremes.
    """
    width = 1 << pw
    df = points
    if start is not None:
        df = df.filter(F.col("time") >= F.lit(start))
    if end is not None:
        df = df.filter(F.col("time") < F.lit(end))

    # min(struct) orders lexicographically: min value, then min time.
    # For the max extreme we want max value then MIN time, so the time
    # component is negated inside the struct and restored after.
    agg = (
        df.withColumn("bucket", bucket_start(F.col("time"), width))
        .groupBy("uuid", "bucket")
        .agg(
            F.min(F.struct(F.col("value"), F.col("time"))).alias("lo"),
            F.max(F.struct(F.col("value"), (-F.col("time")).alias("negt"))).alias("hi"),
        )
    )
    lo = F.struct(F.col("lo.time").alias("time"), F.col("lo.value").alias("value"))
    hi = F.struct((-F.col("hi.negt")).alias("time"), F.col("hi.value").alias("value"))
    pts = F.when(lo == hi, F.array(lo)).otherwise(F.array(lo, hi))
    return (
        agg.select("uuid", F.explode(pts).alias("p"))
        .select("uuid", F.col("p.time").alias("time"), F.col("p.value").alias("value"))
    )


def decimate_minmax_oracle_sql(
    points_sql: str,
    start: int | None = None,
    end: int | None = None,
    pw: int = 42,
) -> str:
    """DuckDB mirror: explicit row_number ranking with the same
    (value, time) tie-breaks; a row is kept if it is the value-asc-first
    or value-desc-first point of its bucket (DISTINCT collapses the
    one-point-bucket case exactly like the Spark single-struct branch)."""
    width = 1 << pw
    conds = ["1=1"]
    if start is not None:
        conds.append(f"time >= {start}")
    if end is not None:
        conds.append(f"time < {end}")
    where = " AND ".join(conds)
    return f"""
        WITH b AS (
            SELECT uuid, time, value, (time >> {pw}) AS bkt
            FROM {points_sql} p WHERE {where}
        ), ranked AS (
            SELECT uuid, time, value,
                   row_number() OVER (PARTITION BY uuid, bkt ORDER BY value ASC,  time ASC) AS rlo,
                   row_number() OVER (PARTITION BY uuid, bkt ORDER BY value DESC, time ASC) AS rhi
            FROM b
        )
        SELECT DISTINCT uuid, time, value FROM ranked WHERE rlo = 1 OR rhi = 1
    """


def lttb_downsample(points: DataFrame, pw: int = 42) -> DataFrame:
    """LTTB-style visual downsampling: one representative point per
    (uuid, 2^pw bucket) — the point with the largest triangle area
    against the NEIGHBOR BUCKET MEANS (Steinarsson's
    largest-triangle-three-buckets with fixed mean anchors instead of
    the previously-selected point, which removes the sequential
    dependence so every bucket selects in parallel — the standard
    distributed adaptation).

    Anchors are the decimal-exact (mean_time, mean_value) of the
    previous/next bucket; area2 = |(ax-cx)*(v-ay) - (ax-t)*(cy-ay)|
    (twice the triangle area, computed with one fixed IEEE op order).
    Edge buckets (no previous or next neighbor) keep their earliest
    point. Ties break to (time, value) ascending.

    Plan: one groupBy for bucket means, one per-stream lag/lead window
    over the (tiny) bucket-mean frame, one join back on (uuid, bucket),
    one per-bucket rank window — both shuffles keyed (uuid[, bucket]),
    no global sort.
    """
    from pyspark.sql import Window

    width = 1 << pw
    dec = "decimal(38,6)"
    b = points.withColumn("bucket_start", bucket_start(F.col("time"), width))
    means = (
        b.groupBy("uuid", "bucket_start")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("time").cast(dec)).alias("ts"),
            F.sum(F.col("value").cast(dec)).alias("vs"),
        )
        .select(
            "uuid",
            "bucket_start",
            (F.col("ts").cast("double") / F.col("cnt")).alias("mt"),
            (F.col("vs").cast("double") / F.col("cnt")).alias("mv"),
        )
    )
    wn = Window.partitionBy("uuid").orderBy("bucket_start")
    anchors = means.select(
        "uuid",
        "bucket_start",
        F.lag("mt").over(wn).alias("ax"),
        F.lag("mv").over(wn).alias("ay"),
        F.lead("mt").over(wn).alias("cx"),
        F.lead("mv").over(wn).alias("cy"),
    )
    j = b.join(anchors, ["uuid", "bucket_start"])
    t = F.col("time").cast("double")
    area2 = F.abs(
        (F.col("ax") - F.col("cx")) * (F.col("value") - F.col("ay"))
        - (F.col("ax") - t) * (F.col("cy") - F.col("ay"))
    )
    wr = Window.partitionBy("uuid", "bucket_start").orderBy(
        F.desc_nulls_last("a2"), F.asc("time"), F.asc("value")
    )
    return (
        j.withColumn("a2", area2)
        .withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select("uuid", "bucket_start", "time", "value")
        .orderBy("uuid", "bucket_start")
    )


def lttb_oracle_sql(points_sql: str, pw: int = 42) -> str:
    w = 1 << pw
    return f"""
        WITH b AS (
            SELECT uuid, time, value,
                   time - ((time % {w} + {w}) % {w}) AS bucket_start
            FROM {points_sql} p
        ), means AS (
            SELECT uuid, bucket_start,
                   CAST(SUM(CAST(time  AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS mt,
                   CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS mv
            FROM b GROUP BY uuid, bucket_start
        ), anchors AS (
            SELECT uuid, bucket_start,
                   LAG(mt)  OVER (PARTITION BY uuid ORDER BY bucket_start) AS ax,
                   LAG(mv)  OVER (PARTITION BY uuid ORDER BY bucket_start) AS ay,
                   LEAD(mt) OVER (PARTITION BY uuid ORDER BY bucket_start) AS cx,
                   LEAD(mv) OVER (PARTITION BY uuid ORDER BY bucket_start) AS cy
            FROM means
        ), scored AS (
            SELECT b.uuid, b.bucket_start, b.time, b.value,
                   ABS((ax - cx) * (b.value - ay) - (ax - CAST(b.time AS DOUBLE)) * (cy - ay)) AS a2
            FROM b JOIN anchors a ON b.uuid = a.uuid AND b.bucket_start = a.bucket_start
        ), ranked AS (
            SELECT uuid, bucket_start, time, value,
                   ROW_NUMBER() OVER (
                       PARTITION BY uuid, bucket_start
                       ORDER BY a2 DESC NULLS LAST, time ASC, value ASC) AS rn
            FROM scored
        )
        SELECT uuid, bucket_start, time, value FROM ranked WHERE rn = 1
        ORDER BY uuid, bucket_start
    """
