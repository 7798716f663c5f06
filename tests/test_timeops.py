"""Floor-division bucketing must be exact for negative times and ns-scale
magnitudes (SURVEY.md §7 watch-list: FIXTURES.md requires negative-time
coverage to catch floor-division bugs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from btrdb_spark.functions.timeops import bucket_of, bucket_start, floor_div


def test_bucket_negative_times(spark):
    df = spark.createDataFrame(
        [(-7,), (-8,), (-1,), (0,), (7,), (8,)], "t long"
    )
    rows = df.select(
        bucket_of(F.col("t"), 8).alias("b"),
        bucket_start(F.col("t"), 8).alias("s"),
    ).collect()
    got = [(r["b"], r["s"]) for r in rows]
    assert got == [(-1, -8), (-1, -8), (-1, -8), (0, 0), (0, 0), (1, 8)]


def test_bucket_non_power_of_two(spark):
    df = spark.createDataFrame([(-10,), (-1,), (0,), (9,), (10,)], "t long")
    rows = df.select(
        bucket_of(F.col("t"), 10).alias("b"), bucket_start(F.col("t"), 10).alias("s")
    ).collect()
    got = [(r["b"], r["s"]) for r in rows]
    assert got == [(-1, -10), (-1, -10), (0, 0), (0, 0), (1, 10)]


def test_bucket_huge_magnitude_exact(spark):
    # 2^62-ish ns with width 1 would lose precision via double division
    t = (1 << 62) - 3
    df = spark.createDataFrame([(t,), (-t,)], "t long")
    rows = df.select(
        floor_div(F.col("t"), F.lit(1).cast("long")).alias("b1"),
        bucket_of(F.col("t"), 2).alias("b2"),
    ).collect()
    assert rows[0]["b1"] == t and rows[1]["b1"] == -t
    assert rows[0]["b2"] == t // 2 and rows[1]["b2"] == (-t) // 2
