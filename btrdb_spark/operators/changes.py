"""Changed-range queries between versions (V2 Changes/QueryChangedRanges).

Reference semantics (quasar.go:398-479, qtree/qtree.go:255-351): the time
ranges that differ between version A (exclusive) and version B (inclusive)
of a stream, snapped to a 2^resolution grid, with adjacent/overlapping
ranges coalesced (merger.go:10-124). Generation-tagged child pointers let
the reference prune the diff; here the version column plays that role: the
changed set is exactly the buckets of rows with A < version <= B, plus the
buckets covered by delete tombstones in (A, B].

Island coalescing is the classic gaps-and-islands pass (SURVEY.md §2.5):
lag(end) over (partition by uuid order by start), flag start > prev_end,
running sum of flags = island id, then one groupBy. Two narrow shuffles over
an already-aggregated (distinct buckets) input — at 100 TB the distinct
bucket set is orders of magnitude smaller than the points.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.timeops import bucket_start


def changed_ranges(
    points: DataFrame,
    uuid: str | None,
    from_ver: int,
    to_ver: int,
    resolution: int,
    deletes: DataFrame | None = None,
) -> DataFrame:
    """V2: coalesced (uuid, start, end) ranges changed in (from_ver, to_ver]."""
    if not (0 <= resolution <= 63):
        raise ValueError(f"resolution out of range: {resolution}")
    width = 1 << resolution
    df = points.filter((F.col("version") > F.lit(from_ver)) & (F.col("version") <= F.lit(to_ver)))
    if uuid is not None:
        df = df.filter(F.col("uuid") == F.lit(uuid))
    buckets = df.select(
        "uuid",
        bucket_start(F.col("time"), width).alias("bstart"),
    ).withColumn("bend", F.col("bstart") + F.lit(width))
    if deletes is not None:
        d = deletes.filter(
            (F.col("version") > F.lit(from_ver)) & (F.col("version") <= F.lit(to_ver))
        )
        if uuid is not None:
            d = d.filter(F.col("uuid") == F.lit(uuid))
        dbuckets = d.select(
            "uuid",
            bucket_start(F.col("start"), width).alias("bstart"),
            # snap end UP to the grid (tombstone covers [start, end))
            bucket_start(F.col("end") - F.lit(1), width).alias("last_b"),
        ).select("uuid", "bstart", (F.col("last_b") + F.lit(width)).alias("bend"))
        buckets = buckets.unionByName(dbuckets)
    buckets = buckets.distinct()
    w = Window.partitionBy("uuid").orderBy("bstart", "bend")
    # prev_end is the RUNNING MAX of bend, not lag(bend): a wide tombstone
    # range can fully contain later, narrower point buckets, and lag would
    # see the contained bucket's small end and split the island
    # (merger.go coalesces overlapping ranges, not just adjacent ones)
    run = buckets.withColumn(
        "prev_end", F.max("bend").over(w.rowsBetween(Window.unboundedPreceding, -1))
    ).withColumn(
        "new_island",
        F.when(F.col("prev_end").isNull() | (F.col("bstart") > F.col("prev_end")), 1).otherwise(0),
    )
    run = run.withColumn(
        "island",
        F.sum("new_island").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    out = (
        run.groupBy("uuid", "island")
        .agg(F.min("bstart").alias("range_start"), F.max("bend").alias("range_end"))
        .select("uuid", "range_start", "range_end")
    )
    return out.orderBy("uuid", "range_start")
