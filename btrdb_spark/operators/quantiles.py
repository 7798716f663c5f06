"""Per-stream exact discrete quantiles over point values.

The reference has no quantile operator (its StatPoint carries only
count/min/mean/max — qtree/qtree.go:796-802); this extends the stat
surface the way a quality-scoring / outlier-trimming pipeline needs it.

Semantics: discrete (type-1) quantile — the value at sorted position
``floor(pct * (n - 1) / 100)`` (0-indexed) within each stream. All rank
arithmetic is integer (pct is a percent), so the DuckDB oracle computes
bit-identical positions; a float ``p * (n - 1)`` would disagree between
engines at exact-integer boundaries (binary 0.99 < decimal 0.99).

Scale: one shuffle — a per-uuid sort via window functions; cost is the
per-stream sort, the honest price of an *exact* quantile. At 100 TB the
sketch path is ``F.percentile_approx`` (t-digest-style, mergeable,
partial-aggregated) — same call shape, approximate answer; this operator
is the correctness baseline the sketch is judged against.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def value_quantiles(
    points: DataFrame, pcts: Sequence[int] = (25, 50, 90, 99)
) -> DataFrame:
    """(uuid, p<pct>...) — exact discrete quantiles of `value` per stream.

    Ties: row_number over equal values assigns arbitrary ranks, but the
    *value* at any fixed rank is unchanged by that choice, so the output
    is deterministic.
    """
    w = Window.partitionBy("uuid").orderBy("value")
    wn = Window.partitionBy("uuid")
    ranked = (
        points.select("uuid", "value")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(wn))
    )
    aggs = [
        F.min(
            F.when(
                F.col("rn") == F.floor(F.lit(int(p)) * (F.col("n") - 1) / F.lit(100)) + 1,
                F.col("value"),
            )
        ).alias(f"p{int(p)}")
        for p in pcts
    ]
    return ranked.groupBy("uuid").agg(*aggs).orderBy("uuid")


def value_quantiles_sketch(
    points: DataFrame,
    pcts: Sequence[int] = (25, 50, 90, 99),
    accuracy: int = 2147483647,
) -> DataFrame:
    """Sketch-path quantiles: ``percentile_approx`` (Greenwald-Khanna
    summary) — ONE map-side-combinable aggregation, no per-stream sort or
    window pass, bounded memory per stream regardless of n. This is the
    100 TB path; `value_quantiles` is the exact baseline.

    ``accuracy`` trades memory for rank error (error <= n/accuracy). The
    default (INT_MAX) makes the sketch exact, which is how the oracle
    gates this operator bit-for-bit; production at 100 TB would run
    accuracy ~1e4 for O(accuracy) state per stream.
    """
    aggs = [
        F.percentile_approx("value", int(p) / 100.0, accuracy).alias(f"p{int(p)}")
        for p in pcts
    ]
    return points.select("uuid", "value").groupBy("uuid").agg(*aggs).orderBy("uuid")


def quantile_sketch_oracle_sql(
    points_sql: str, pcts: Sequence[int] = (25, 50, 90, 99)
) -> str:
    """DuckDB mirror of the exact-accuracy sketch path: discrete quantiles
    (both engines return an actual data element at the same nearest rank)."""
    cols = ",\n               ".join(
        f"quantile_disc(value, {int(p) / 100.0}) AS p{int(p)}" for p in pcts
    )
    return f"""
        SELECT uuid, {cols}
        FROM {points_sql} p GROUP BY uuid ORDER BY uuid
    """


def quantile_oracle_sql(points_sql: str, pcts: Sequence[int] = (25, 50, 90, 99)) -> str:
    """DuckDB mirror of value_quantiles over a points relation."""
    cols = ",\n               ".join(
        f"MIN(CASE WHEN rn = FLOOR({int(p)} * (n - 1) / 100) + 1 THEN value END) AS p{int(p)}"
        for p in pcts
    )
    return f"""
        WITH r AS (
            SELECT uuid, value,
                   ROW_NUMBER() OVER (PARTITION BY uuid ORDER BY value) AS rn,
                   COUNT(*) OVER (PARTITION BY uuid) AS n
            FROM {points_sql} p
        )
        SELECT uuid, {cols}
        FROM r GROUP BY uuid ORDER BY uuid
    """


def value_histogram(
    points: DataFrame, lo: float, hi: float, n_bins: int = 20
) -> DataFrame:
    """Fixed-bin value histogram per stream — the monitoring-dashboard
    distribution view (the reference's users recompute this client-side
    from raw scans; here it is one partial-aggregated groupBy whose key
    count is streams x bins, balanced regardless of value skew).

    Out-of-range values clamp into the edge bins (standard monitoring
    convention — the tails stay visible). bin_start/bin_end are the
    nominal bin bounds. Bins with no data are absent (sparse output).

    Output: (uuid, bin, bin_start, bin_end, cnt), ordered.
    """
    if not (hi > lo and n_bins > 0):
        raise ValueError("need hi > lo and n_bins > 0")
    binw = (hi - lo) / n_bins
    raw_bin = F.floor((F.col("value") - F.lit(lo)) / F.lit(binw))
    b = F.least(F.greatest(raw_bin, F.lit(0)), F.lit(n_bins - 1)).cast("long")
    return (
        points.select("uuid", b.alias("bin"))
        .groupBy("uuid", "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "uuid",
            "bin",
            (F.lit(lo) + F.col("bin") * F.lit(binw)).alias("bin_start"),
            (F.lit(lo) + (F.col("bin") + 1) * F.lit(binw)).alias("bin_end"),
            "cnt",
        )
        .orderBy("uuid", "bin")
    )


def histogram_oracle_sql(points_sql: str, lo: float, hi: float, n_bins: int = 20) -> str:
    binw = (hi - lo) / n_bins
    return f"""
        WITH b AS (
            SELECT uuid,
                   CAST(LEAST(GREATEST(FLOOR((value - {lo!r}) / {binw!r}), 0), {n_bins - 1}) AS BIGINT) AS bin
            FROM {points_sql} p
        )
        SELECT uuid, bin,
               {lo!r} + bin * {binw!r} AS bin_start,
               {lo!r} + (bin + 1) * {binw!r} AS bin_end,
               COUNT(*) AS cnt
        FROM b GROUP BY uuid, bin ORDER BY uuid, bin
    """
