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


def test_floor_div_bucket_property(spark):
    """Property test vs Python's exact integer floor ops: floor_div and
    bucket_start must be exact for any int64 time (incl. negative) and any
    width — mirrors the reference's ClampTime/ClampBucket contract
    (qtree_utils.go:268-324)."""
    from hypothesis import given, settings, strategies as st

    from pyspark.sql import functions as F

    from btrdb_spark.functions.timeops import bucket_start, floor_div

    MIN_T, MAX_T = -(16 << 56), (48 << 56) - 1

    @settings(max_examples=20, deadline=None)
    @given(
        ts=st.lists(st.integers(MIN_T, MAX_T), min_size=1, max_size=50),
        width=st.one_of(
            st.integers(1, 1 << 50),
            st.sampled_from([1 << p for p in range(1, 60)]),
        ),
    )
    def check(ts, width):
        df = spark.createDataFrame([(t,) for t in ts], "t long").select(
            "t",
            floor_div(F.col("t"), F.lit(width).cast("long")).alias("fd"),
            bucket_start(F.col("t"), width).alias("bs"),
        )
        for r in df.collect():
            assert r["fd"] == r["t"] // width, (r["t"], width)
            assert r["bs"] == (r["t"] // width) * width, (r["t"], width)

    check()
