"""Resampling and differentiation over irregular telemetry.

Neither exists in the reference (its stat windows aggregate, they don't
interpolate — SURVEY §2.4); both are staples of the workloads BTrDB
serves (synchrophasor alignment, rate-of-change alarms):

- ``resample_locf``: last-observation-carried-forward onto a regular
  grid — a direct composition of the batched as-of join (one window
  pass; grid cells before a stream's first point stay NULL rather than
  inventing data).
- ``stream_rate``: per-stream discrete derivative between consecutive
  points (lag window). Duplicate timestamps are ordered by value for a
  deterministic lag, and zero-dt pairs are dropped rather than emitting
  inf — both rules mirrored in the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .asof import asof_join

NS_PER_SEC = 1_000_000_000


def resample_locf(
    points: DataFrame,
    uuids: DataFrame,
    start: int,
    end: int,
    width: int,
    chunk_width: int | None = None,
) -> DataFrame:
    """(uuid, grid_time, last_time, value): LOCF sample of each stream in
    ``uuids`` at grid_time = start + k*width for k in [0, (end-start)/width).

    Inclusive as-of (time <= grid_time): a point exactly on the grid is
    its own sample. One window shuffle; the grid generation is a
    broadcast cross join against a `spark.range` (no driver loop).
    ``chunk_width`` opts into the skew-safe two-pass as-of plan (see
    asof_join) for pathological single-stream volumes.
    """
    n = (end - start) // width
    grid = points.sparkSession.range(n).select(
        (F.lit(start) + F.col("id") * F.lit(width)).alias("t")
    )
    probes = uuids.select("uuid").crossJoin(F.broadcast(grid))
    out = asof_join(points, probes, forward=False, strict=False, chunk_width=chunk_width)
    return out.select(
        "uuid",
        F.col("t").alias("grid_time"),
        F.col("asof_time").alias("last_time"),
        F.col("asof_value").alias("value"),
    ).orderBy("uuid", "grid_time")


def resample_locf_oracle_sql(points_sql: str, uuids_sql: str, start: int, end: int, width: int) -> str:
    from .asof import asof_oracle_sql

    n = (end - start) // width
    probes = (
        f"(SELECT uuid, CAST({start} AS BIGINT) + gs.generate_series * {width} AS t "
        f"FROM {uuids_sql} u CROSS JOIN generate_series(0, {n - 1}) gs)"
    )
    inner = asof_oracle_sql(points_sql, probes, forward=False, strict=False)
    return (
        f"SELECT uuid, t AS grid_time, asof_time AS last_time, asof_value AS value "
        f"FROM ({inner}) q ORDER BY uuid, grid_time"
    )


def resample_linear(
    points: DataFrame,
    uuids: DataFrame,
    start: int,
    end: int,
    width: int,
) -> DataFrame:
    """Linear interpolation of each stream onto a regular grid.

    For each grid cell: prev = inclusive backward as-of point, nxt =
    strict forward as-of point. value = pv + (nv - pv) * frac with
    frac = (grid - prev_t) / (next_t - prev_t) — a point exactly on the
    grid interpolates to itself (frac = 0). Grid cells after a stream's
    last point carry the previous value (LOCF tail); cells before the
    first point stay NULL.

    Two window passes over the SAME (uuid[, chunk]) partitioning — Spark
    reuses one exchange for both as-of directions. The arithmetic is the
    identical IEEE expression in the oracle (long subtraction, one double
    division, one multiply, one add) so values match bit-for-bit.
    """
    n = (end - start) // width
    grid = points.sparkSession.range(n).select(
        (F.lit(start) + F.col("id") * F.lit(width)).alias("t")
    )
    probes = uuids.select("uuid").crossJoin(F.broadcast(grid))
    back = asof_join(points, probes, forward=False, strict=False)
    fwd = asof_join(points, probes, forward=True, strict=True).select(
        "uuid",
        "t",
        F.col("asof_time").alias("next_t"),
        F.col("asof_value").alias("next_v"),
    )
    j = back.join(fwd, ["uuid", "t"])
    frac = (F.col("t") - F.col("asof_time")).cast("double") / (
        F.col("next_t") - F.col("asof_time")
    ).cast("double")
    interp = F.when(
        F.col("asof_time").isNull(), F.lit(None).cast("double")
    ).when(
        F.col("next_t").isNull(), F.col("asof_value")
    ).otherwise(F.col("asof_value") + (F.col("next_v") - F.col("asof_value")) * frac)
    return j.select(
        "uuid",
        F.col("t").alias("grid_time"),
        interp.alias("value"),
    ).orderBy("uuid", "grid_time")


def resample_linear_oracle_sql(
    points_sql: str, uuids_sql: str, start: int, end: int, width: int
) -> str:
    from .asof import asof_oracle_sql

    n = (end - start) // width
    probes = (
        f"(SELECT uuid, CAST({start} AS BIGINT) + gs.generate_series * {width} AS t "
        f"FROM {uuids_sql} u CROSS JOIN generate_series(0, {n - 1}) gs)"
    )
    back = asof_oracle_sql(points_sql, probes, forward=False, strict=False)
    fwd = asof_oracle_sql(points_sql, probes, forward=True, strict=True)
    return f"""
        WITH b AS ({back}), f AS ({fwd})
        SELECT b.uuid, b.t AS grid_time,
               CASE WHEN b.asof_time IS NULL THEN NULL
                    WHEN f.asof_time IS NULL THEN b.asof_value
                    ELSE b.asof_value + (f.asof_value - b.asof_value) *
                         (CAST(b.t - b.asof_time AS DOUBLE) /
                          CAST(f.asof_time - b.asof_time AS DOUBLE))
               END AS value
        FROM b JOIN f ON b.uuid = f.uuid AND b.t = f.t
        ORDER BY b.uuid, grid_time
    """


def rolling_zscore(points: DataFrame, window_rows: int = 20) -> DataFrame:
    """Per-stream rolling z-score anomaly signal over the trailing
    ``window_rows`` points (ROWS frame, ordered by (time, value) so
    duplicate timestamps are deterministic).

    Running sums go through DECIMAL(38,6) (the engine's exact-mean
    convention, timeops.py) — a double sum over a sliding frame would
    accumulate in engine-specific order and drift by ulps. The variance is
    the textbook (ss - s*m) / (n-1) expansion computed with the identical
    IEEE op sequence in the oracle; z is NULL until the frame holds
    ``window_rows`` points or when the variance is 0 (constant window).

    The frame sums are computed as differences of running
    (UNBOUNDED PRECEDING) sums rather than literal sliding-frame
    aggregates: Spark's SlidingWindowFunctionFrame has no retract path
    and re-evaluates the aggregate over the whole frame at every row
    (O(n*window) decimal additions), while running frames are
    incremental O(n). Decimal arithmetic is exact, so the difference
    equals the frame sum digit-for-digit and casts to the identical
    double; a running non-null count guards the sum's
    NULL-on-all-null-frame semantics.

    One shuffle on uuid; the frame state is O(window) per task.
    """
    wr = window_rows
    ord_w = Window.partitionBy("uuid").orderBy("time", "value")
    cum = ord_w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dec = F.col("value").cast("decimal(38,6)")
    dec2 = (F.col("value") * F.col("value")).cast("decimal(38,6)")
    base = points.select(
        "uuid",
        "time",
        "value",
        F.row_number().over(ord_w).alias("_rn"),
        F.sum(dec).over(cum).alias("_rs"),
        F.sum(dec2).over(cum).alias("_rss"),
        F.count(dec).over(cum).alias("_rc"),
    )
    zero = F.lit(0).cast("decimal(38,6)")
    cnt_nn = F.col("_rc") - F.coalesce(F.lag("_rc", wr).over(ord_w), F.lit(0))
    n = F.least(F.col("_rn"), F.lit(wr))
    s = F.when(
        cnt_nn > 0, F.col("_rs") - F.coalesce(F.lag("_rs", wr).over(ord_w), zero)
    ).cast("double")
    ss = F.when(
        cnt_nn > 0, F.col("_rss") - F.coalesce(F.lag("_rss", wr).over(ord_w), zero)
    ).cast("double")
    m = s / n
    var = (ss - s * m) / (n - F.lit(1))
    z = F.when(
        (n >= wr) & (var > 0), (F.col("value") - m) / F.sqrt(var)
    )
    return base.select(
        "uuid",
        "time",
        "value",
        n.cast("long").alias("n_window"),
        m.alias("mean_w"),
        z.alias("z"),
    ).orderBy("uuid", "time", "value")


def rolling_zscore_oracle_sql(points_sql: str, window_rows: int = 20) -> str:
    wf = f"OVER (PARTITION BY uuid ORDER BY time, value ROWS BETWEEN {window_rows - 1} PRECEDING AND CURRENT ROW)"
    return f"""
        WITH t AS (
            SELECT uuid, time, value,
                   COUNT(*) {wf} AS n,
                   CAST(SUM(CAST(value AS DECIMAL(38,6))) {wf} AS DOUBLE) AS s,
                   CAST(SUM(CAST(value * value AS DECIMAL(38,6))) {wf} AS DOUBLE) AS ss
            FROM {points_sql} p
        )
        SELECT uuid, time, value,
               CAST(n AS BIGINT) AS n_window,
               s / n AS mean_w,
               CASE WHEN n >= {window_rows} AND (ss - s * (s / n)) / (n - 1) > 0
                    THEN (value - s / n) / sqrt((ss - s * (s / n)) / (n - 1))
               END AS z
        FROM t ORDER BY uuid, time, value
    """


def find_gaps(points: DataFrame, min_gap: int) -> DataFrame:
    """Telemetry QC: intervals longer than ``min_gap`` ns with no data,
    per stream — the first question an operator asks of a sensor fleet
    (the reference's users run this client-side over ChangedRanges; here
    it is one lag-window pass).

    Output: (uuid, gap_start, gap_end, gap_ns) where gap_start/gap_end
    are the bracketing point timestamps, ordered by (uuid, gap_start).
    """
    w = Window.partitionBy("uuid").orderBy("time", "value")
    df = points.select(
        "uuid", "time", F.lag("time").over(w).alias("pt")
    ).filter(F.col("pt").isNotNull() & (F.col("time") - F.col("pt") > min_gap))
    return df.select(
        "uuid",
        F.col("pt").alias("gap_start"),
        F.col("time").alias("gap_end"),
        (F.col("time") - F.col("pt")).alias("gap_ns"),
    ).orderBy("uuid", "gap_start", "gap_end")


def find_gaps_oracle_sql(points_sql: str, min_gap: int) -> str:
    return f"""
        WITH l AS (
            SELECT uuid, time,
                   LAG(time) OVER (PARTITION BY uuid ORDER BY time, value) AS pt
            FROM {points_sql} p
        )
        SELECT uuid, pt AS gap_start, time AS gap_end, time - pt AS gap_ns
        FROM l WHERE pt IS NOT NULL AND time - pt > {min_gap}
        ORDER BY uuid, gap_start, gap_end
    """


def stream_rate(points: DataFrame) -> DataFrame:
    """(uuid, time, rate_per_sec): (v - v_prev) * 1e9 / (t - t_prev) per
    stream, consecutive points by (time, value) order; zero-dt dropped."""
    w = Window.partitionBy("uuid").orderBy("time", "value")
    df = points.select(
        "uuid",
        "time",
        "value",
        F.lag("time").over(w).alias("pt"),
        F.lag("value").over(w).alias("pv"),
    ).filter(F.col("pt").isNotNull() & (F.col("time") > F.col("pt")))
    rate = (F.col("value") - F.col("pv")) * F.lit(float(NS_PER_SEC)) / (
        F.col("time") - F.col("pt")
    )
    return df.select("uuid", "time", rate.alias("rate_per_sec")).orderBy(
        "uuid", "time", "rate_per_sec"
    )


def stream_rate_oracle_sql(points_sql: str) -> str:
    return f"""
        WITH l AS (
            SELECT uuid, time, value,
                   LAG(time)  OVER (PARTITION BY uuid ORDER BY time, value) AS pt,
                   LAG(value) OVER (PARTITION BY uuid ORDER BY time, value) AS pv
            FROM {points_sql} p
        )
        SELECT uuid, time,
               (value - pv) * 1000000000.0 / (time - pt) AS rate_per_sec
        FROM l WHERE pt IS NOT NULL AND time > pt
        ORDER BY uuid, time, rate_per_sec
    """


def ewma(points: DataFrame, alpha: float = 0.25) -> DataFrame:
    """Per-stream exponentially-weighted moving average — the recurrence
    e_i = (1-alpha)*e_{i-1} + alpha*x_i, e_0 = x_0, over time order.

    A linear recurrence is the one shape Catalyst window functions cannot
    express (each output depends on the previous OUTPUT, not input), so
    this is the documented Arrow-kernel case: mapInPandas over a
    uuid-hash repartition, each partition's rows sorted (uuid, time,
    value) inside the kernel (shuffle does not deliver time order) and
    folded stream-by-stream, the fold evaluated in the EXACT
    expression shape `(1-alpha)*prev + alpha*x` so the DuckDB
    recursive-CTE oracle is bit-identical. Pick an alpha representable in
    binary (0.25, 0.5, 0.125...) when cross-engine bit-equality matters;
    any alpha is fine within Spark.

    Scale: one shuffle keyed by uuid; state is one running double per
    stream. A stream whose history exceeds one task's memory needs a
    chunked carry pass (the asof_join_chunked pattern: fold each (uuid,
    time-chunk), then a tiny sequential pass threads the carry through
    chunk boundaries); at the fixture scale the direct fold is exact and
    the plumbing identical. Output: (uuid, time, value, ewma).
    """
    a = float(alpha)

    def fold(pdfs):
        import pandas as pd

        # One kernel call per PARTITION (mapInPandas over a uuid-hash
        # repartition), not one Arrow batch per group: per-group
        # applyInPandas paid ~20 ms of batch/frame overhead x n_streams
        # (measured 5.5s vs 1.5s on the 150-stream fixture). Chunks of a
        # partition arrive in arbitrary order — concat ALL, sort once.
        chunks = list(pdfs)
        if not chunks:
            return
        rows = pd.concat(chunks, ignore_index=True).sort_values(
            ["uuid", "time", "value"], kind="mergesort"
        )
        # pandas groupby-ewm(adjust=False) evaluates the same expression
        # shape ((1-a)*prev + a*x) in C per group — verified bit-identical
        # to the python fold and to the DuckDB recursive CTE
        e = (
            rows.groupby("uuid", sort=False)["value"]
            .ewm(alpha=a, adjust=False)
            .mean()
            .reset_index(drop=True)
        )
        yield rows.assign(ewma=e.to_numpy())[["uuid", "time", "value", "ewma"]]

    return (
        points.select("uuid", "time", "value")
        .repartition(F.col("uuid"))
        .mapInPandas(fold, "uuid string, time long, value double, ewma double")
    )


def ewma_oracle_sql(points_sql: str, alpha: float = 0.25) -> str:
    """DuckDB recursive-CTE mirror of ewma (same expression shape)."""
    return f"""
        WITH RECURSIVE r AS (
            SELECT uuid, time, value,
                   ROW_NUMBER() OVER (PARTITION BY uuid ORDER BY time, value) AS rn
            FROM {points_sql} p
        ), rec AS (
            SELECT uuid, time, value, rn, value AS ewma FROM r WHERE rn = 1
            UNION ALL
            SELECT r.uuid, r.time, r.value, r.rn,
                   (1.0 - {alpha!r}) * rec.ewma + {alpha!r} * r.value
            FROM rec JOIN r ON r.uuid = rec.uuid AND r.rn = rec.rn + 1
        )
        SELECT uuid, time, value, ewma FROM rec ORDER BY uuid, time, value
    """


def cusum_alarms(
    points: DataFrame, k: float = 8.0, h: float = 64.0,
    target: float | None = None,
) -> DataFrame:
    """Per-stream two-sided CUSUM changepoint alarms (Page 1954) — the
    classic sequential drift detector telemetry fleets run against each
    sensor. Tracking statistics against the stream's own mean mu:

        pos_i = max(0, pos_{i-1} + (x_i - mu - k))
        neg_i = max(0, neg_{i-1} + (mu - x_i - k))

    An alarm fires when a statistic exceeds h; the fired statistic
    resets to 0 (restart detection). Output: one row per fired alarm,
    (uuid, time, value, direction 'up'|'down', stat = the pre-reset
    exceedance value), time-ordered per stream.

    This is a linear recurrence with reset — not expressible as a
    Catalyst window function — so it takes the documented Arrow-kernel
    shape (the ewma/sdt_compress pattern): mapInPandas over a uuid-hash
    repartition, rows sorted (uuid, time, value) inside the kernel,
    folded per stream with the EXACT expression shape the DuckDB
    recursive-CTE oracle evaluates (`s + (x - mu - k)`, `GREATEST(0,.)`)
    so alarms match bit-for-bit. mu is the decimal-exact per-stream mean
    (one map-side-combinable groupBy, broadcast back onto the points);
    pick binary-representable k/h when cross-engine equality matters.

    Scale: one uuid shuffle + one tiny mean frame; state is two running
    doubles per stream. Giant streams chunk with a carry pass like
    asof_join_chunked.
    """
    from ..functions import decsum

    kk, hh = float(k), float(h)
    if target is not None:
        # fixed-target mode (Page's original procedure, and the mode the
        # STREAMING variant uses — a live stream has no final mean): mu is
        # a plan literal, no mean pass at all; batch and live alarms agree
        # exactly on an in-order feed (tests/test_streaming_cusum.py)
        keyed = points.select("uuid", "time", "value").withColumn(
            "mu", F.lit(float(target))
        )
    else:
        mu_df = (
            points.groupBy("uuid")
            .agg(F.count(F.lit(1)).alias("cnt"), *decsum.sum_aggs(F.col("value")))
            .select(
                "uuid", (decsum.vsum().cast("double") / F.col("cnt")).alias("mu")
            )
        )
        keyed = points.select("uuid", "time", "value").join(
            F.broadcast(mu_df), "uuid"
        )

    def fold(pdfs):
        import pandas as pd

        chunks = list(pdfs)
        if not chunks:
            return
        rows = pd.concat(chunks, ignore_index=True).sort_values(
            ["uuid", "time", "value"], kind="mergesort"
        )
        out_u, out_t, out_v, out_d, out_s = [], [], [], [], []
        for uuid, g in rows.groupby("uuid", sort=False):
            mu = float(g["mu"].iloc[0])
            pos = 0.0
            neg = 0.0
            for t, x in zip(g["time"].to_numpy(), g["value"].to_numpy()):
                x = float(x)
                pos = max(0.0, pos + (x - mu - kk))
                neg = max(0.0, neg + (mu - x - kk))
                if pos > hh:
                    out_u.append(uuid); out_t.append(int(t)); out_v.append(x)
                    out_d.append("up"); out_s.append(pos)
                    pos = 0.0
                if neg > hh:
                    out_u.append(uuid); out_t.append(int(t)); out_v.append(x)
                    out_d.append("down"); out_s.append(neg)
                    neg = 0.0
        yield pd.DataFrame(
            {"uuid": out_u, "time": out_t, "value": out_v,
             "direction": out_d, "stat": out_s}
        )

    return (
        keyed.repartition(F.col("uuid"))
        .mapInPandas(
            fold,
            "uuid string, time long, value double, direction string, stat double",
        )
    )


def cusum_oracle_sql(points_sql: str, k: float = 8.0, h: float = 64.0) -> str:
    """DuckDB recursive-CTE mirror of cusum_alarms (same expression
    shapes, same decimal-exact mu)."""
    kk, hh = float(k), float(h)
    return f"""
        WITH RECURSIVE mu AS (
            SELECT uuid,
                   CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS mu
            FROM {points_sql} p GROUP BY uuid
        ), r AS (
            SELECT p.uuid, p.time, p.value, mu.mu,
                   ROW_NUMBER() OVER (PARTITION BY p.uuid ORDER BY p.time, p.value) AS rn
            FROM {points_sql} p JOIN mu ON mu.uuid = p.uuid
        ), rec AS (
            SELECT uuid, time, value, mu, rn,
                   GREATEST(0.0, 0.0 + (value - mu - {kk!r})) AS pos_pre,
                   GREATEST(0.0, 0.0 + (mu - value - {kk!r})) AS neg_pre,
                   CASE WHEN GREATEST(0.0, 0.0 + (value - mu - {kk!r})) > {hh!r}
                        THEN 0.0 ELSE GREATEST(0.0, 0.0 + (value - mu - {kk!r})) END AS pos,
                   CASE WHEN GREATEST(0.0, 0.0 + (mu - value - {kk!r})) > {hh!r}
                        THEN 0.0 ELSE GREATEST(0.0, 0.0 + (mu - value - {kk!r})) END AS neg
            FROM r WHERE rn = 1
            UNION ALL
            SELECT r.uuid, r.time, r.value, r.mu, r.rn,
                   GREATEST(0.0, rec.pos + (r.value - r.mu - {kk!r})),
                   GREATEST(0.0, rec.neg + (r.mu - r.value - {kk!r})),
                   CASE WHEN GREATEST(0.0, rec.pos + (r.value - r.mu - {kk!r})) > {hh!r}
                        THEN 0.0 ELSE GREATEST(0.0, rec.pos + (r.value - r.mu - {kk!r})) END,
                   CASE WHEN GREATEST(0.0, rec.neg + (r.mu - r.value - {kk!r})) > {hh!r}
                        THEN 0.0 ELSE GREATEST(0.0, rec.neg + (r.mu - r.value - {kk!r})) END
            FROM rec JOIN r ON r.uuid = rec.uuid AND r.rn = rec.rn + 1
        )
        SELECT uuid, time, value, 'up' AS direction, pos_pre AS stat
        FROM rec WHERE pos_pre > {hh!r}
        UNION ALL
        SELECT uuid, time, value, 'down' AS direction, neg_pre AS stat
        FROM rec WHERE neg_pre > {hh!r}
        ORDER BY uuid, time, direction
    """


def find_peaks(
    points: DataFrame,
    w: int = 3,
    min_value: float | None = None,
) -> DataFrame:
    """Per-stream local-maximum (peak) detection: a point is a peak when
    its value is strictly greater than every OTHER point within the
    surrounding 2w+1-row neighborhood (w rows each side in time order),
    optionally above an absolute floor. The grid-sensor use case: locate
    voltage-sag/frequency-excursion events for a human to inspect —
    reference users run exactly this client-side over RawValues pulls.

    Output: (uuid, time, value, prominence) where prominence = value
    minus the largest neighbor value, > 0 by construction.

    Determinism on duplicate values: STRICT inequality means plateaus
    (equal neighboring maxima) produce no peak — same rule both engines,
    no tie-break needed. Pure window comparisons and one subtraction:
    no float accumulation at all, so cross-engine equality is trivial.

    Plan shape: ONE window pass over (uuid, time, value) — max over the
    w-preceding and w-following ROWS frames; no self-join, no explode.
    One uuid-keyed exchange; state per task is the 2w+1 row frame.
    """
    wspec = Window.partitionBy("uuid").orderBy("time", "value")
    before = F.max("value").over(wspec.rowsBetween(-w, -1))
    after = F.max("value").over(wspec.rowsBetween(1, w))
    neigh = F.greatest(
        F.coalesce(before, F.lit(float("-inf"))),
        F.coalesce(after, F.lit(float("-inf"))),
    )
    out = (
        points.select("uuid", "time", "value")
        .withColumn("_n", neigh)
        .filter(F.col("value") > F.col("_n"))
        .select("uuid", "time", "value", (F.col("value") - F.col("_n")).alias("prominence"))
    )
    if min_value is not None:
        out = out.filter(F.col("value") >= F.lit(float(min_value)))
    return out


def find_peaks_oracle_sql(
    points_sql: str, w: int = 3, min_value: float | None = None
) -> str:
    """DuckDB mirror of find_peaks (same frames, same strict rule)."""
    floor = f"AND value >= {float(min_value)!r}" if min_value is not None else ""
    return f"""
        WITH n AS (
            SELECT uuid, time, value,
                   GREATEST(
                     COALESCE(MAX(value) OVER (
                       PARTITION BY uuid ORDER BY time, value
                       ROWS BETWEEN {w} PRECEDING AND 1 PRECEDING), '-infinity'::DOUBLE),
                     COALESCE(MAX(value) OVER (
                       PARTITION BY uuid ORDER BY time, value
                       ROWS BETWEEN 1 FOLLOWING AND {w} FOLLOWING), '-infinity'::DOUBLE)
                   ) AS nmax
            FROM {points_sql} p
        )
        SELECT uuid, time, value, value - nmax AS prominence
        FROM n WHERE value > nmax {floor}
        ORDER BY uuid, time
    """


def time_weighted_mean(
    points: DataFrame,
    start: int,
    end: int,
    pw: int = 45,
) -> DataFrame:
    """Per-(stream, 2^pw bucket) TIME-WEIGHTED mean under LOCF hold —
    the correct average for unevenly-sampled telemetry (a thermostat
    reporting on-change: arithmetic mean over-weights chatty periods;
    the time-weighted mean integrates the held value). The reference's
    StatPoints are count-weighted; users with on-change sensors compute
    exactly this client-side from RawValues.

    Semantics: point i holds its value over [t_i, t_{i+1}) (last point
    holds to `end`), segments clipped to [start, end) and SPLIT at
    bucket boundaries; vtwmean(bucket) = sum(v_i * overlap_ns) /
    sum(overlap_ns). Zero-length segments (duplicate timestamps) hold
    nothing and contribute nothing — the later point in (time, value)
    order wins the hold, deterministically.

    Determinism: overlaps are exact int64 ns; products are
    DECIMAL(19,6) x DECIMAL(18,0) -> precision 38 in Spark (19+18+1) and 37 in DuckDB (19+18), both scale 6 — EXACT in both (no rounding; a (20,6) operand would push Spark past 38 and license rounding) — exact, so the sums
    are order-independent; ONE double division at the end. Identical
    expression shapes in the DuckDB oracle.

    Plan shape: one lead() window pass builds segments (uuid-keyed
    exchange), a bounded explode splits each segment across the buckets
    it overlaps (rows ∝ segments + covered buckets — output-shaped),
    one map-side-combinable groupBy folds the integral. At 100 TB this
    reads raw points once; no self-joins, no grids.
    """
    width = 1 << pw
    from ..functions.timeops import floor_div

    w = Window.partitionBy("uuid").orderBy("time", "value")
    seg = (
        points.select("uuid", "time", "value")
        .filter((F.col("time") < F.lit(end)))
        .withColumn("t_next", F.lead("time").over(w))
        .select(
            "uuid",
            "value",
            F.greatest(F.col("time"), F.lit(start)).alias("s"),
            F.least(F.coalesce(F.col("t_next"), F.lit(end)), F.lit(end)).alias("e"),
        )
        .filter(F.col("e") > F.col("s"))
    )
    wl = F.lit(width).cast("long")
    b0 = floor_div(F.col("s"), wl)
    b1 = floor_div(F.col("e") - 1, wl)
    pieces = seg.select(
        "uuid",
        "value",
        "s",
        "e",
        F.explode(F.sequence(b0, b1)).alias("b"),
    ).select(
        "uuid",
        (F.col("b") * width).alias("bucket_start"),
        (
            F.least(F.col("e"), (F.col("b") + 1) * width)
            - F.greatest(F.col("s"), F.col("b") * width)
        ).alias("dur"),
        F.col("value").cast("decimal(19,6)").alias("v_dec"),
    )
    agg = pieces.groupBy("uuid", "bucket_start").agg(
        F.sum(F.col("v_dec") * F.col("dur").cast("decimal(18,0)")).alias("vw"),
        F.sum("dur").alias("w"),
    )
    return agg.select(
        "uuid",
        "bucket_start",
        F.col("w").cast("long").alias("held_ns"),
        (F.col("vw").cast("double") / F.col("w").cast("double")).alias("vtwmean"),
    )


def time_weighted_mean_oracle_sql(
    points_sql: str, start: int, end: int, pw: int = 45
) -> str:
    """DuckDB mirror of time_weighted_mean (same decimal products, same
    one double division)."""
    width = 1 << pw
    return f"""
        WITH seg AS (
            SELECT uuid, value,
                   GREATEST(time, {start}) AS s,
                   LEAST(COALESCE(LEAD(time) OVER (PARTITION BY uuid ORDER BY time, value), {end}), {end}) AS e
            FROM {points_sql} p
            WHERE time < {end}
        ), clipped AS (
            SELECT * FROM seg WHERE e > s
        ), pieces AS (
            SELECT uuid,
                   bb.b * {width} AS bucket_start,
                   LEAST(e, (bb.b + 1) * {width}) - GREATEST(s, bb.b * {width}) AS dur,
                   CAST(value AS DECIMAL(19,6)) AS v_dec
            FROM clipped,
                 unnest(range(s // {width}, (e - 1) // {width} + 1)) bb(b)
        )
        SELECT uuid, bucket_start,
               CAST(SUM(dur) AS BIGINT) AS held_ns,
               -- DECIMAL -> VARCHAR -> DOUBLE: DuckDB's direct
               -- DECIMAL(38,6)->DOUBLE cast double-rounds past ~17
               -- significant digits (int128 then /1e6); the varchar
               -- parse is correctly rounded and matches Spark's
               -- BigDecimal.doubleValue()
               CAST(CAST(SUM(v_dec * CAST(dur AS DECIMAL(18,0))) AS VARCHAR) AS DOUBLE)
                 / CAST(SUM(dur) AS DOUBLE) AS vtwmean
        FROM pieces GROUP BY uuid, bucket_start
        ORDER BY uuid, bucket_start
    """


def holt_forecast(
    points: DataFrame,
    alpha: float = 0.5,
    beta: float = 0.25,
    horizon_buckets: int = 3,
    pw: int = 45,
) -> DataFrame:
    """Holt's linear-trend double exponential smoothing per stream, over
    the 2^pw bucket-mean series, plus an h-step-ahead forecast — the
    capacity-planning read ("where is this feeder trending") reference
    users run client-side over AlignedWindows pulls.

    Recurrences over the bucket means x_1..x_n (standard Holt):

        l_1 = x_1,                b_1 = 0
        l_i = alpha*x_i + (1-alpha)*(l_{i-1} + b_{i-1})
        b_i = beta*(l_i - l_{i-1}) + (1-beta)*b_{i-1}

    Output, one row per stream: (uuid, n_buckets, level, trend,
    forecast_1 .. forecast_h) with forecast_j = level + j*trend.

    Two COUPLED linear recurrences — the window-function-inexpressible
    shape (the ewma/cusum Arrow-kernel family): bucket means are
    2^-20-quantized (the stream_correlations contract, making the input
    series deterministic), the fold evaluates the EXACT expression
    shapes above in float64, and the DuckDB recursive-CTE oracle
    evaluates the same shapes — bit-identical for binary-representable
    alpha/beta (0.5, 0.25, ...).

    Plan shape: one map-side-combinable groupBy builds the bucket means
    (can read the rollup ladder at scale), one uuid shuffle feeds the
    kernel, state = two doubles per stream; output is stream-count rows.
    """
    from ..functions import decsum

    a, b = float(alpha), float(beta)
    width = 1 << pw
    from ..functions.timeops import bucket_start as _bs

    _Q = float(1 << 20)
    m = (
        points.withColumn("bucket", _bs(F.col("time"), width))
        .groupBy("uuid", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"), *decsum.sum_aggs(F.col("value")))
        .select(
            "uuid",
            "bucket",
            (
                F.floor((decsum.vsum().cast("double") / F.col("cnt")) * F.lit(_Q))
                .cast("long")
                .cast("double")
                / F.lit(_Q)
            ).alias("x"),
        )
    )

    h = int(horizon_buckets)
    if h < 0:
        raise ValueError("horizon_buckets must be >= 0")
    # build the full column-spec list and join once, so h=0 degrades to a
    # clean level/trend-only schema instead of a trailing-comma parse error
    schema = ", ".join(
        ["uuid string", "n_buckets long", "level double", "trend double"]
        + [f"forecast_{j} double" for j in range(1, h + 1)]
    )

    def fold(pdfs):
        import pandas as pd

        chunks = list(pdfs)
        if not chunks:
            return
        rows = pd.concat(chunks, ignore_index=True).sort_values(
            ["uuid", "bucket"], kind="mergesort"
        )
        out = []
        for uuid, g in rows.groupby("uuid", sort=False):
            xs = g["x"].to_numpy()
            level = float(xs[0])
            trend = 0.0
            for x in xs[1:]:
                prev = level
                level = a * float(x) + (1.0 - a) * (level + trend)
                trend = b * (level - prev) + (1.0 - b) * trend
            out.append(
                [uuid, len(xs), level, trend]
                + [level + j * trend for j in range(1, h + 1)]
            )
        cols = ["uuid", "n_buckets", "level", "trend"] + [
            f"forecast_{j}" for j in range(1, h + 1)
        ]
        yield pd.DataFrame(out, columns=cols)

    return (
        m.repartition(F.col("uuid"))
        .mapInPandas(fold, schema)
    )


def holt_oracle_sql(
    points_sql: str,
    alpha: float = 0.5,
    beta: float = 0.25,
    horizon_buckets: int = 3,
    pw: int = 45,
) -> str:
    """DuckDB recursive-CTE mirror of holt_forecast."""
    a, b = float(alpha), float(beta)
    width = 1 << pw
    _Q = float(1 << 20)
    h = int(horizon_buckets)
    fsel = ", ".join(
        f"level + {j} * trend AS forecast_{j}" for j in range(1, h + 1)
    )
    return f"""
        WITH RECURSIVE m AS (
            SELECT uuid,
                   (time // {width}) * {width} AS bucket,
                   CAST(CAST(FLOOR((CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)) * {_Q!r}) AS BIGINT) AS DOUBLE) / {_Q!r} AS x
            FROM {points_sql} p GROUP BY 1, 2
        ), r AS (
            SELECT uuid, x,
                   ROW_NUMBER() OVER (PARTITION BY uuid ORDER BY bucket) AS rn
            FROM m
        ), rec AS (
            SELECT uuid, rn, x AS level, CAST(0.0 AS DOUBLE) AS trend, x AS prev_level
            FROM r WHERE rn = 1
            UNION ALL
            SELECT r.uuid, r.rn,
                   {a!r} * r.x + (1.0 - {a!r}) * (rec.level + rec.trend),
                   {b!r} * (({a!r} * r.x + (1.0 - {a!r}) * (rec.level + rec.trend)) - rec.level)
                     + (1.0 - {b!r}) * rec.trend,
                   rec.level
            FROM rec JOIN r ON r.uuid = rec.uuid AND r.rn = rec.rn + 1
        ), last AS (
            SELECT uuid, rn, level, trend,
                   ROW_NUMBER() OVER (PARTITION BY uuid ORDER BY rn DESC) AS rr
            FROM rec
        )
        SELECT uuid, CAST(rn AS BIGINT) AS n_buckets, level, trend, {fsel}
        FROM last WHERE rr = 1 ORDER BY uuid
    """


def stream_availability(
    points: DataFrame, start: int, end: int, max_gap: int
) -> DataFrame:
    """Per-stream availability KPI over [start, end): the fraction of the
    range NOT covered by data gaps longer than ``max_gap`` ns — the
    fleet-health dashboard number ("feeder 12 was 99.3% available in
    January"). The lead-in before the first point and the tail after the
    last point count as gaps when longer than max_gap (a silent sensor
    is unavailable, not unmeasured).

    Output: (uuid, n_points, n_gaps, downtime_ns, availability) — all
    integer arithmetic except the ONE final double division, so
    cross-engine equality is exact.

    Plan shape: one lag-window pass over in-range points builds interior
    gaps; per-stream min/max (map-side-combinable groupBy) bound the
    edge gaps; one join of two stream-count-sized frames. No grids, no
    explodes; cost is one shuffle on uuid.
    """
    inr = points.filter((F.col("time") >= start) & (F.col("time") < end))
    w = Window.partitionBy("uuid").orderBy("time", "value")
    interior = (
        inr.select("uuid", "time", F.lag("time").over(w).alias("pt"))
        .filter(F.col("pt").isNotNull() & (F.col("time") - F.col("pt") > max_gap))
        .groupBy("uuid")
        .agg(
            F.count(F.lit(1)).alias("n_interior_gaps"),
            F.sum(F.col("time") - F.col("pt")).alias("interior_ns"),
        )
    )
    bounds = inr.groupBy("uuid").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.min("time").alias("t_first"),
        F.max("time").alias("t_last"),
    )
    lead_ns = F.col("t_first") - F.lit(start)
    tail_ns = F.lit(end) - F.col("t_last")
    lead_gap = F.when(lead_ns > max_gap, lead_ns).otherwise(F.lit(0))
    tail_gap = F.when(tail_ns > max_gap, tail_ns).otherwise(F.lit(0))
    out = (
        bounds.join(interior, "uuid", "left")
        .select(
            "uuid",
            "n_points",
            (
                F.coalesce(F.col("n_interior_gaps"), F.lit(0))
                + F.when(lead_gap > 0, 1).otherwise(0)
                + F.when(tail_gap > 0, 1).otherwise(0)
            ).cast("long").alias("n_gaps"),
            (
                F.coalesce(F.col("interior_ns"), F.lit(0)) + lead_gap + tail_gap
            ).cast("long").alias("downtime_ns"),
        )
    )
    span = float(end - start)
    return out.withColumn(
        "availability",
        F.lit(1.0) - F.col("downtime_ns").cast("double") / F.lit(span),
    )


def stream_availability_oracle_sql(
    points_sql: str, start: int, end: int, max_gap: int
) -> str:
    """DuckDB mirror of stream_availability (same integer gap algebra)."""
    span = float(end - start)
    return f"""
        WITH inr AS (
            SELECT uuid, time, value FROM {points_sql} p
            WHERE time >= {start} AND time < {end}
        ), lagd AS (
            SELECT uuid, time,
                   LAG(time) OVER (PARTITION BY uuid ORDER BY time, value) AS pt
            FROM inr
        ), interior AS (
            SELECT uuid, COUNT(*) AS n_interior_gaps, SUM(time - pt) AS interior_ns
            FROM lagd WHERE pt IS NOT NULL AND time - pt > {max_gap}
            GROUP BY uuid
        ), bounds AS (
            SELECT uuid, COUNT(*) AS n_points, MIN(time) AS t_first, MAX(time) AS t_last
            FROM inr GROUP BY uuid
        )
        SELECT b.uuid, CAST(b.n_points AS BIGINT) AS n_points,
               CAST(COALESCE(i.n_interior_gaps, 0)
                    + CASE WHEN b.t_first - {start} > {max_gap} THEN 1 ELSE 0 END
                    + CASE WHEN {end} - b.t_last > {max_gap} THEN 1 ELSE 0 END AS BIGINT) AS n_gaps,
               CAST(COALESCE(i.interior_ns, 0)
                    + CASE WHEN b.t_first - {start} > {max_gap} THEN b.t_first - {start} ELSE 0 END
                    + CASE WHEN {end} - b.t_last > {max_gap} THEN {end} - b.t_last ELSE 0 END AS BIGINT) AS downtime_ns,
               1.0 - CAST(COALESCE(i.interior_ns, 0)
                    + CASE WHEN b.t_first - {start} > {max_gap} THEN b.t_first - {start} ELSE 0 END
                    + CASE WHEN {end} - b.t_last > {max_gap} THEN {end} - b.t_last ELSE 0 END AS DOUBLE) / {span!r} AS availability
        FROM bounds b LEFT JOIN interior i ON i.uuid = b.uuid
        ORDER BY b.uuid
    """


def counter_increase(points: DataFrame, pw: int = 45) -> DataFrame:
    """Prometheus-style counter ``increase`` per 2^pw-ns bucket with
    reset handling — the query every telemetry backend runs over
    monotonic counters (requests served, bytes sent, packet totals from
    a PMU's status counters):

      delta  = value - lag(value) per stream in (time, value) order
      reset  (delta < 0): the counter restarted; the observable increase
             since the previous sample is the new value itself
      increase attributed to the bucket containing the LATER sample

    Output: (uuid, bucket_start, increase, n_resets, n_samples),
    increase decimal-exact (decsum convention) cast double, per-stream
    rate derivable as increase / bucket_seconds.

    Plan: one lag window partitioned by uuid (the same shuffle the
    groupBy reuses via partial aggregation), no global sort, integer
    counts + one exact decimal sum.
    """
    from ..functions import decsum
    from ..functions.timeops import bucket_start as _bs

    w = Window.partitionBy("uuid").orderBy("time", "value")
    lagged = points.select(
        "uuid",
        "time",
        "value",
        F.lag("value").over(w).alias("pv"),
    ).filter(F.col("pv").isNotNull())
    inc = F.when(
        F.col("value") >= F.col("pv"), F.col("value") - F.col("pv")
    ).otherwise(F.col("value"))
    out = (
        lagged.select(
            "uuid",
            _bs(F.col("time"), 1 << pw).alias("bucket_start"),
            inc.alias("inc"),
            (F.col("value") < F.col("pv")).cast("long").alias("is_reset"),
        )
        .groupBy("uuid", "bucket_start")
        .agg(
            *decsum.sum_aggs(F.col("inc")),
            F.sum("is_reset").alias("n_resets"),
            F.count(F.lit(1)).alias("n_samples"),
        )
    )
    return out.select(
        "uuid",
        "bucket_start",
        decsum.vsum().cast("double").alias("increase"),
        F.col("n_resets").cast("long").alias("n_resets"),
        F.col("n_samples").cast("long").alias("n_samples"),
    ).orderBy("uuid", "bucket_start")


def counter_increase_oracle_sql(points_sql: str, pw: int = 45) -> str:
    w = 1 << pw
    return f"""
        WITH l AS (
            SELECT uuid, time, value,
                   LAG(value) OVER (PARTITION BY uuid ORDER BY time, value) AS pv
            FROM {points_sql} p
        ), d AS (
            SELECT uuid,
                   time - ((time % {w} + {w}) % {w}) AS bucket_start,
                   CASE WHEN value >= pv THEN value - pv ELSE value END AS inc,
                   CASE WHEN value < pv THEN 1 ELSE 0 END AS is_reset
            FROM l WHERE pv IS NOT NULL
        )
        SELECT uuid, bucket_start,
               CAST(SUM(CAST(inc AS DECIMAL(38,6))) AS DOUBLE) AS increase,
               CAST(SUM(is_reset) AS BIGINT) AS n_resets,
               CAST(COUNT(*) AS BIGINT) AS n_samples
        FROM d GROUP BY uuid, bucket_start
        ORDER BY uuid, bucket_start
    """


def burstiness(points: DataFrame, pw: int = 45) -> DataFrame:
    """Per-stream traffic burstiness: the Fano factor (variance-to-mean
    ratio) of per-2^pw-bucket event counts — ~1 for Poisson arrivals,
    >>1 for bursty telemetry; the dispersion screen run before capacity
    planning or anomaly thresholds.

    Exact arithmetic: bucket counts are integers; with k populated
    buckets, mean m = S/k and the population variance is
    (k*SS - S^2) / k^2 — all integer sums, assembled in one fixed double
    expression, so the output is bit-identical cross-engine.

    Note the statistic is over POPULATED buckets (empty buckets are
    absent from the rollup shape, matching the ladder's semantics).
    Two map-side-combinable groupBys, both keyed by uuid.
    """
    from ..functions.timeops import bucket_start as _bs

    cnts = (
        points.withColumn("b", _bs(F.col("time"), 1 << pw))
        .groupBy("uuid", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    agg = cnts.groupBy("uuid").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("ss"),
    )
    k = F.col("k").cast("double")
    s = F.col("s").cast("double")
    ss = F.col("ss").cast("double")
    mean = s / k
    var = (k * ss - s * s) / (k * k)
    return agg.select(
        "uuid",
        F.col("k").cast("long").alias("n_buckets"),
        F.col("s").cast("long").alias("n_points"),
        mean.alias("mean_per_bucket"),
        (var / mean).alias("fano"),
    ).orderBy("uuid")


def burstiness_oracle_sql(points_sql: str, pw: int = 45) -> str:
    w = 1 << pw
    return f"""
        WITH cnts AS (
            SELECT uuid, time - ((time % {w} + {w}) % {w}) AS b, COUNT(*) AS c
            FROM {points_sql} p GROUP BY 1, 2
        ), agg AS (
            SELECT uuid, COUNT(*) AS k, SUM(c) AS s, SUM(c * c) AS ss
            FROM cnts GROUP BY uuid
        )
        SELECT uuid,
               CAST(k AS BIGINT) AS n_buckets,
               CAST(s AS BIGINT) AS n_points,
               CAST(s AS DOUBLE) / CAST(k AS DOUBLE) AS mean_per_bucket,
               ((CAST(k AS DOUBLE) * CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                / (CAST(k AS DOUBLE) * CAST(k AS DOUBLE)))
               / (CAST(s AS DOUBLE) / CAST(k AS DOUBLE)) AS fano
        FROM agg ORDER BY uuid
    """
