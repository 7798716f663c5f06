"""Binned-DFT spectral power — periodicity detection over irregular
telemetry (is this feeder diurnal? does load cycle weekly?), the
frequency-domain sibling of `diurnal_profile`/`stream_autocorr`.

For each stream and each probe period P, estimate the DFT power

    power(P) = ((Σ v·cos φ)² + (Σ v·sin φ)²) / n²,   φ = 2π·(t mod P)/P

with the phase quantized to ``n_bins`` of a cycle (the binned / phase-
folded periodogram — exact for signals band-limited below the bin rate,
and the standard trick for irregular sampling where a plain FFT does not
apply). n² normalization makes a pure cosine of amplitude A score
(A/2)² regardless of sample count.

Cross-engine exactness (the repo's oracle-gate discipline): the cos/sin
tables are generated ONCE driver-side in Python and embedded into both
engines as literals (repr round-trips doubles exactly; the oracle casts
VARCHAR literals to DOUBLE so DuckDB never routes them through DECIMAL).
Each term is quantized — floor((v·c)·2^20) — after ONE IEEE multiply
chain identical in both engines, then accumulated as EXACT longs
(order-independent, reassociation-proof), and only the final power
arithmetic returns to floating point (a fixed 5-op IEEE sequence).

Scale shape: phase binning is integer arithmetic on the scan; the coef
table is n_bins rows → broadcast hash join; the accumulation is ONE
map-side-combinable groupBy (uuid, period). Overflow bound: |v·c·2^20|
≲ 2^20·|v|, so a sum stays inside int64 for ~2^43/|v| points per
(stream, period) — at 1 ms telemetry that is decades of data per stream.

No reference analog (extension); complements diurnal_profile
(operators/resample.py) which answers "what does the daily shape look
like" where this answers "which periods carry energy at all".
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Q = float(1 << 20)  # dyadic quantum — exact as a double in both engines


def _coef_rows(n_bins: int) -> list[tuple[int, float, float]]:
    """(bin, cos, sin) at each bin midpoint — midpoint, not left edge, so
    the quantization error is centered (classic phase-folding choice)."""
    return [
        (
            b,
            math.cos(2.0 * math.pi * (b + 0.5) / n_bins),
            math.sin(2.0 * math.pi * (b + 0.5) / n_bins),
        )
        for b in range(n_bins)
    ]


def spectral_power(
    points: DataFrame,
    periods_ns: list[int],
    t0: int = 0,
    n_bins: int = 256,
) -> DataFrame:
    """Per-stream binned-DFT power at each probe period.

    Output: (uuid, period_ns, n long, power double), ordered.
    """
    spark = points.sparkSession
    coef = spark.createDataFrame(_coef_rows(n_bins), "bin long, c double, s double")
    per = spark.createDataFrame(
        [(int(p),) for p in periods_ns], "period_ns long"
    )
    # phase bin: ((t - t0) mod P) * n_bins // P  — all int64; the
    # multiply fits because n_bins * P < 2^63 for any sub-century period
    binned = (
        points.crossJoin(F.broadcast(per))
        .select(
            "uuid",
            "period_ns",
            "value",
            # `div` (not `/`): Spark's / is DOUBLE division, which loses
            # integer precision past 2^53 — phase*n_bins reaches ~1e17
            F.expr(
                f"pmod(time - {int(t0)}L, period_ns) * {n_bins}L div period_ns"
            ).alias("bin"),
        )
        .join(F.broadcast(coef), "bin")
    )
    acc = binned.groupBy("uuid", "period_ns").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(F.col("value") * F.col("c") * F.lit(Q)).cast("long")).alias("sc"),
        F.sum(F.floor(F.col("value") * F.col("s") * F.lit(Q)).cast("long")).alias("ss"),
    )
    # back to floats only for the final fixed-shape arithmetic
    c = (F.col("sc").cast("double") / F.lit(Q)) / F.col("n").cast("double")
    s = (F.col("ss").cast("double") / F.lit(Q)) / F.col("n").cast("double")
    return acc.select(
        "uuid",
        "period_ns",
        "n",
        (c * c + s * s).alias("power"),
    ).orderBy("uuid", "period_ns")


def spectral_power_oracle_sql(
    points_sql: str,
    periods_ns: list[int],
    t0: int = 0,
    n_bins: int = 256,
) -> str:
    """DuckDB mirror: identical literal coef table (VARCHAR→DOUBLE so the
    values never pass through DECIMAL), identical quantized accumulation."""
    coef_values = ",\n            ".join(
        f"({b}, CAST('{c!r}' AS DOUBLE), CAST('{s!r}' AS DOUBLE))"
        for b, c, s in _coef_rows(n_bins)
    )
    per_values = ", ".join(f"({int(p)})" for p in periods_ns)
    q = str(1 << 20)  # INTEGER literal: DuckDB parses 1048576.0 as DECIMAL
    return f"""
        WITH coef(bin, c, s) AS (VALUES
            {coef_values}
        ), per(period_ns) AS (VALUES {per_values}
        ), binned AS (
            SELECT p.uuid, per.period_ns, p.value,
                   (((p.time - {t0}) % per.period_ns + per.period_ns)
                     % per.period_ns) * {n_bins} // per.period_ns AS bin
            FROM {points_sql} p CROSS JOIN per
        ), acc AS (
            SELECT b.uuid, b.period_ns,
                   COUNT(*) AS n,
                   SUM(CAST(FLOOR(b.value * coef.c * {q}) AS BIGINT)) AS sc,
                   SUM(CAST(FLOOR(b.value * coef.s * {q}) AS BIGINT)) AS ss
            FROM binned b JOIN coef USING (bin)
            GROUP BY b.uuid, b.period_ns
        )
        SELECT uuid, period_ns, CAST(n AS BIGINT) AS n,
               (CAST(sc AS DOUBLE) / {q} / CAST(n AS DOUBLE))
                 * (CAST(sc AS DOUBLE) / {q} / CAST(n AS DOUBLE))
               + (CAST(ss AS DOUBLE) / {q} / CAST(n AS DOUBLE))
                 * (CAST(ss AS DOUBLE) / {q} / CAST(n AS DOUBLE)) AS power
        FROM acc ORDER BY uuid, period_ns
    """
