"""Exact integer time-bucket arithmetic.

The reference buckets nanosecond int64 times into 2^pw windows with bit
operations (qtree/qtree_utils.go:268-324 ClampTime/ClampBucket). Times may be
negative (domain starts at -(16<<56)), so bucketing MUST be floor division,
not truncation — and it must stay in int64: ``col / lit`` goes through a
double and silently loses precision above 2^53 ns.

Floor division, exact in int64 for any width > 0:

    floor_div(t, w) = (t - pmod(t, w)) div w

where ``div`` is integer division (numerator is exactly divisible, so
truncation == floor) and pmod is the non-negative remainder. For power-of-two
widths an arithmetic right shift is equivalent and cheaper; both Spark's
``shiftright`` and DuckDB's ``>>`` are arithmetic on BIGINT (verified).

DuckDB oracle mirrors: ``(t - ((t % w + w) % w)) // w`` and ``t >> pw``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def pmod_long(t: Column, width: Column) -> Column:
    return F.pmod(t, width)


def floor_div(t: Column, width: Column) -> Column:
    """Exact floor division for long columns (handles negative t)."""
    return F.call_function("div", t - F.pmod(t, width), width)


def bucket_of(t: Column, width: int) -> Column:
    """Window index of time t for windows of `width` ns aligned to 0."""
    if width > 0 and (width & (width - 1)) == 0:
        return F.shiftright(t, width.bit_length() - 1)
    return floor_div(t, F.lit(width).cast("long"))


def bucket_start(t: Column, width: int) -> Column:
    """Start time of the width-aligned window containing t (= t - pmod)."""
    if width > 0 and (width & (width - 1)) == 0:
        # t & ~(width-1) — the reference's ClampTime (qtree_utils.go:268-276)
        return F.shiftleft(F.shiftright(t, width.bit_length() - 1), width.bit_length() - 1)
    return t - F.pmod(t, F.lit(width).cast("long"))


def snap_down(t: Column, width: int) -> Column:
    """Alias for bucket_start — the reference's `t &^ (width-1)` for 2^pw."""
    return bucket_start(t, width)


# --- DuckDB-side mirrors (exact same integer arithmetic) ---

def sql_pmod(t: str, w: str) -> str:
    return f"((({t}) % ({w}) + ({w})) % ({w}))"


def sql_floor_div(t: str, w: str) -> str:
    return f"((({t}) - {sql_pmod(t, w)}) // ({w}))"


def sql_bucket_start(t: str, w: str) -> str:
    return f"(({t}) - {sql_pmod(t, w)})"
