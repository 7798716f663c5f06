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


def _exact_median(df: DataFrame, col: str) -> DataFrame:
    """Per-uuid exact lower median of ``col`` — rank floor((n-1)/2)+1,
    the p50 convention of value_quantiles (value at a fixed rank is
    deterministic regardless of tie order)."""
    w = Window.partitionBy("uuid").orderBy(col)
    wn = Window.partitionBy("uuid")
    ranked = (
        df.select("uuid", col)
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(wn))
    )
    return ranked.groupBy("uuid").agg(
        F.min(
            F.when(
                F.col("rn") == F.floor((F.col("n") - 1) / 2) + 1, F.col(col)
            )
        ).alias(f"med_{col}")
    )


def value_mad_outliers(points: DataFrame, k: float = 3.0) -> DataFrame:
    """Per-stream robust outlier summary via median/MAD — the standard
    telemetry anomaly screen (mean/stddev break down exactly when
    outliers exist; median absolute deviation does not).

    med = exact lower median of value; mad = exact lower median of
    |value - med|; a point is an outlier when |value - med| > k * mad.
    All arithmetic is IEEE +-*/ and exact rank selection, so the DuckDB
    oracle matches bit-for-bit (same convention as value_quantiles).

    Scale shape: two ranked window passes over (uuid) plus one final
    groupBy; the per-stream (med, mad) frames are stream-count-sized and
    broadcast back onto the points. Output: (uuid, med, mad, n,
    n_outliers, outlier_frac), ordered by uuid.
    """
    med = _exact_median(points, "value").withColumnRenamed("med_value", "med")
    dev = points.join(F.broadcast(med), "uuid").select(
        "uuid", "value", "med", F.abs(F.col("value") - F.col("med")).alias("adev")
    )
    mad = _exact_median(dev, "adev").withColumnRenamed("med_adev", "mad")
    out = (
        dev.join(F.broadcast(mad), "uuid")
        .groupBy("uuid", "med", "mad")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("adev") > F.lit(float(k)) * F.col("mad"), 1).otherwise(0)
            ).alias("n_outliers"),
        )
    )
    return out.select(
        "uuid",
        "med",
        "mad",
        F.col("n").cast("long").alias("n"),
        F.col("n_outliers").cast("long").alias("n_outliers"),
        (F.col("n_outliers") / F.col("n")).alias("outlier_frac"),
    ).orderBy("uuid")


def mad_outliers_oracle_sql(points_sql: str, k: float = 3.0) -> str:
    """DuckDB mirror of value_mad_outliers (identical rank + IEEE ops)."""
    return f"""
        WITH r AS (
            SELECT uuid, value,
                   ROW_NUMBER() OVER (PARTITION BY uuid ORDER BY value) AS rn,
                   COUNT(*) OVER (PARTITION BY uuid) AS n
            FROM {points_sql} p
        ), med AS (
            SELECT uuid, MIN(CASE WHEN rn = FLOOR((n - 1) / 2) + 1 THEN value END) AS med
            FROM r GROUP BY uuid
        ), d AS (
            SELECT p.uuid, p.value, med.med, ABS(p.value - med.med) AS adev
            FROM {points_sql} p JOIN med ON p.uuid = med.uuid
        ), r2 AS (
            SELECT uuid, med, adev,
                   ROW_NUMBER() OVER (PARTITION BY uuid ORDER BY adev) AS rn,
                   COUNT(*) OVER (PARTITION BY uuid) AS n
            FROM d
        ), mad AS (
            SELECT uuid, MIN(CASE WHEN rn = FLOOR((n - 1) / 2) + 1 THEN adev END) AS mad
            FROM r2 GROUP BY uuid
        )
        SELECT d.uuid, d.med, mad.mad,
               COUNT(*) AS n,
               CAST(SUM(CASE WHEN d.adev > {float(k)!r} * mad.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
               CAST(SUM(CASE WHEN d.adev > {float(k)!r} * mad.mad THEN 1 ELSE 0 END) AS DOUBLE)
                   / COUNT(*) AS outlier_frac
        FROM d JOIN mad ON d.uuid = mad.uuid
        GROUP BY d.uuid, d.med, mad.mad
        ORDER BY d.uuid
    """


def diurnal_profile(points: DataFrame, tz_offset_hours: int = 0) -> DataFrame:
    """Per-stream hour-of-day load profile — the seasonal-baseline query
    behind every telemetry dashboard (and the input to time-of-day
    anomaly baselines). Pure integer hour extraction from ns timestamps
    (never through float or timestamp types: ns exceed 2^53 and tz
    libraries differ across engines) + one partial-aggregated groupBy
    whose key count is streams x 24 — balanced under any time skew.

    Output: (uuid, hour, cnt, vmin, vmean, vmax), vmean decimal-exact
    (decsum convention), ordered.
    """
    from ..functions import decsum
    from ..functions.timeops import floor_div

    ns_per_hour = 3_600_000_000_000
    hour = F.pmod(
        floor_div(F.col("time"), F.lit(ns_per_hour)) + F.lit(int(tz_offset_hours)),
        F.lit(24),
    )
    agg = (
        points.select("uuid", hour.cast("long").alias("hour"), "value")
        .groupBy("uuid", "hour")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
            *decsum.sum_aggs(F.col("value")),
        )
    )
    return agg.select(
        "uuid",
        "hour",
        "cnt",
        "vmin",
        (decsum.vsum().cast("double") / F.col("cnt")).alias("vmean"),
        "vmax",
    ).orderBy("uuid", "hour")


def diurnal_oracle_sql(points_sql: str, tz_offset_hours: int = 0) -> str:
    """DuckDB mirror: integer hour math (// floors; %% wrapped to the
    nonnegative residue to match Spark's pmod on pre-1970 times)."""
    return f"""
        WITH h AS (
            SELECT uuid,
                   ((((time // 3600000000000) + {int(tz_offset_hours)}) % 24) + 24) % 24 AS hour,
                   value
            FROM {points_sql} p
        )
        SELECT uuid, CAST(hour AS BIGINT) AS hour, COUNT(*) AS cnt,
               MIN(value) AS vmin,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS vmean,
               MAX(value) AS vmax
        FROM h GROUP BY uuid, hour ORDER BY uuid, hour
    """


def window_quantiles(
    points: DataFrame,
    pw: int = 42,
    pcts: Sequence[int] = (50, 90),
) -> DataFrame:
    """Exact per-(stream, 2^pw time bucket) discrete quantiles — the
    windowed percentile dashboard (p50/p90 per hour-ish bucket) that
    telemetry operators read next to the StatPoint min/mean/max the
    reference serves. Extends value_quantiles with the time dimension.

    Output: (uuid, bucket_start, p<pct>... ) one row per non-empty
    bucket. Rank selection only (type-1 quantile, rank =
    floor(pct*(n-1)/100)+1): values are SELECTED, never combined, so
    there is no float arithmetic and cross-engine equality is exact.

    Plan shape: one window pass over (uuid, bucket) — row_number +
    count — then the same groupBy folds every requested percentile as a
    conditional min. One uuid-bucket-keyed exchange; per-task state is
    a bucket's rows (bounded by bucket width, not stream length — the
    windowed variant is MORE scale-friendly than the global one).
    """
    width = 1 << pw
    from ..functions.timeops import bucket_start

    b = bucket_start(F.col("time"), width)
    w = Window.partitionBy("uuid", "bucket_start").orderBy("value")
    wn = Window.partitionBy("uuid", "bucket_start")
    ranked = (
        points.select("uuid", b.alias("bucket_start"), "value")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(wn))
    )
    aggs = [
        F.min(
            F.when(
                F.col("rn")
                == F.floor(F.lit(int(p)) * (F.col("n") - 1) / F.lit(100)) + 1,
                F.col("value"),
            )
        ).alias(f"p{int(p)}")
        for p in pcts
    ]
    return ranked.groupBy("uuid", "bucket_start").agg(*aggs)


def window_quantiles_oracle_sql(
    points_sql: str, pw: int = 42, pcts: Sequence[int] = (50, 90)
) -> str:
    """DuckDB mirror of window_quantiles (same integer rank selection)."""
    width = 1 << pw
    cols = ", ".join(
        f"MIN(CASE WHEN rn = CAST(FLOOR({int(p)} * (n - 1) / 100) AS BIGINT) + 1 "
        f"THEN value END) AS p{int(p)}"
        for p in pcts
    )
    return f"""
        WITH r AS (
            SELECT uuid,
                   time - ((time % {width} + {width}) % {width}) AS bucket_start,
                   value,
                   ROW_NUMBER() OVER (PARTITION BY uuid, time - ((time % {width} + {width}) % {width}) ORDER BY value) AS rn,
                   COUNT(*) OVER (PARTITION BY uuid, time - ((time % {width} + {width}) % {width})) AS n
            FROM {points_sql} p
        )
        SELECT uuid, bucket_start, {cols}
        FROM r GROUP BY uuid, bucket_start ORDER BY uuid, bucket_start
    """


def seasonal_anomaly(
    points: DataFrame,
    z_threshold: float = 3.0,
    min_bucket: int = 10,
    tz_offset_hours: int = 0,
) -> DataFrame:
    """Seasonal (hour-of-day) anomaly screen: flag points whose value
    deviates more than ``z_threshold`` standard deviations from the
    stream's OWN profile for that hour of day — the anomaly detector that
    does not page on the nightly load dip, because the baseline is
    seasonal, not global. Composes the diurnal_profile baseline with a
    z-score, all in one plan.

    Determinism contract: per-(uuid, hour) sufficient statistics are
    exact (count, decimal sum, decimal sum of squares); mean/variance
    assemble through the identical IEEE expression in both engines
    ((ss - s*m) / (n-1), the rolling_zscore convention); one subtraction
    + one division + one sqrt per point. Buckets with fewer than
    ``min_bucket`` points or zero variance flag nothing (no baseline, no
    alarm).

    Output: (uuid, time, value, hour, z) for |z| > z_threshold.

    Plan shape: one groupBy (streams x 24 keys — balanced under any time
    skew), baseline broadcast back onto the points (dashboard-sized
    frame), one scan-project for the z. Two passes over points, zero
    window functions.
    """
    from ..functions import decsum
    from ..functions.timeops import floor_div

    ns_per_hour = 3_600_000_000_000
    hour = F.pmod(
        floor_div(F.col("time"), F.lit(ns_per_hour)) + F.lit(int(tz_offset_hours)),
        F.lit(24),
    ).cast("long")
    pts = points.select("uuid", "time", "value", hour.alias("hour"))
    base = (
        pts.groupBy("uuid", "hour")
        .agg(
            F.count(F.lit(1)).alias("n"),
            *decsum.sum_aggs(F.col("value")),
            F.sum((F.col("value") * F.col("value")).cast("decimal(38,6)")).alias("ss_d"),
        )
        .select(
            "uuid",
            "hour",
            "n",
            decsum.vsum().cast("double").alias("s"),
            F.col("ss_d").cast("double").alias("ss"),
        )
    )
    m = F.col("s") / F.col("n")
    var = (F.col("ss") - F.col("s") * m) / (F.col("n") - F.lit(1))
    base = base.select(
        "uuid", "hour", "n", m.alias("m"),
        F.when(var > 0, F.sqrt(var)).alias("sd"),
    )
    z = (F.col("value") - F.col("m")) / F.col("sd")
    return (
        pts.join(F.broadcast(base), ["uuid", "hour"])
        .filter((F.col("n") >= min_bucket) & F.col("sd").isNotNull())
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) > F.lit(float(z_threshold)))
        .select("uuid", "time", "value", "hour", "z")
    )


def seasonal_anomaly_oracle_sql(
    points_sql: str,
    z_threshold: float = 3.0,
    min_bucket: int = 10,
    tz_offset_hours: int = 0,
) -> str:
    """DuckDB mirror of seasonal_anomaly (identical statistics assembly)."""
    tz = int(tz_offset_hours)
    return f"""
        WITH pts AS (
            SELECT uuid, time, value,
                   ((((time // 3600000000000) + {tz}) % 24) + 24) % 24 AS hour
            FROM {points_sql} p
        ), base AS (
            SELECT uuid, hour, COUNT(*) AS n,
                   CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS s,
                   CAST(SUM(CAST(value * value AS DECIMAL(38,6))) AS DOUBLE) AS ss
            FROM pts GROUP BY uuid, hour
        ), stats AS (
            SELECT uuid, hour, n, s / n AS m,
                   CASE WHEN (ss - s * (s / n)) / (n - 1) > 0
                        THEN sqrt((ss - s * (s / n)) / (n - 1)) END AS sd
            FROM base
        )
        SELECT p.uuid, p.time, p.value, CAST(p.hour AS BIGINT) AS hour,
               (p.value - st.m) / st.sd AS z
        FROM pts p JOIN stats st ON st.uuid = p.uuid AND st.hour = p.hour
        WHERE st.n >= {int(min_bucket)} AND st.sd IS NOT NULL
          AND abs((p.value - st.m) / st.sd) > {float(z_threshold)!r}
        ORDER BY p.uuid, p.time
    """
