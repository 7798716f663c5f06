"""The correlate-envelope exactness contract rides on ANSI mode.

``operators/correlate.py`` proves its projection sums exact only INSIDE an
envelope (|term| < 2^47); OUTSIDE it the contract is "fail loud with
ARITHMETIC_OVERFLOW", which only holds when ``spark.sql.ansi.enabled`` is
true.  VERDICT r10 #5: pin the config in ``get_spark`` and test both that
the pin took and that overflow actually raises rather than wrapping.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_get_spark_pins_ansi(spark):
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"


def test_long_sum_overflow_raises_not_wraps(spark):
    # Two near-max longs: a non-ANSI session wraps this sum negative
    # silently; under the pinned config Spark must raise.
    df = spark.createDataFrame(
        [((1 << 62),), ((1 << 62),), ((1 << 62),)], "v long"
    )
    with pytest.raises(Exception, match="(?i)overflow|ARITHMETIC"):
        df.agg(F.sum("v")).collect()


def test_long_multiply_overflow_raises_not_wraps(spark):
    # The correlate tail multiplies xa*xb as int64; past the envelope the
    # multiply itself must fail loud (the documented out-of-envelope
    # behavior in operators/correlate.py).
    df = spark.createDataFrame([((1 << 40),)], "v long")
    with pytest.raises(Exception, match="(?i)overflow|ARITHMETIC"):
        df.select((F.col("v") * F.col("v") * F.lit(1 << 40)).alias("p")).collect()
