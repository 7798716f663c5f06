"""Set-oriented as-of join: for each (uuid, t) probe, the latest point at
or before t (or earliest at/after t).

The reference's Nearest RPC (J3 — /root/reference/qtree/qtree.go:24-127,
quasar.go:359-391) answers ONE probe per call; this is the batched,
scale-out generalization: N probes in one plan, the canonical "as-of
join" Spark lacks as a built-in.

Implementation is the union trick, not a range join: probes (value=NULL)
are unioned with points and a single window pass per uuid picks the last
non-null value before each probe. Cost = one shuffle + sort per uuid —
O((P+N) log) with NO candidate blowup, versus a range join whose
candidate set is probe x matching-bucket. Tie rules are explicit so the
DuckDB oracle is bit-identical:

- backward strict (the reference's B=true semantics, qtree.go:24-26):
  points strictly before t — probes sort BEFORE same-time points.
- forward inclusive (B=false): first point with time >= t — implemented
  as the mirrored backward pass on negated time.
- equal-time duplicate points: the max value wins (points at equal time
  sort by value; last wins), making ties deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.timeops import floor_div


def asof_join(
    points: DataFrame,
    probes: DataFrame,
    forward: bool = False,
    strict: bool | None = None,
    chunk_width: int | None = None,
) -> DataFrame:
    """probes(uuid, t) -> (uuid, t, asof_time, asof_value).

    backward (default): latest point with time <  t  (strict, ref B=true)
    forward:            earliest point with time >= t (inclusive, B=false)
    ``strict`` overrides the equal-time rule (default matches the
    reference: backward strict, forward inclusive); strict=False backward
    is last-observation-carried-forward (time <= t) — what resampling
    wants. Probes with no qualifying point yield NULL asof_time/asof_value.

    ``chunk_width`` (ns) switches to the skew-safe two-pass plan: the
    single-window path partitions by uuid only, so one pathological
    stream (a 100 TB table can hold a stream with billions of points)
    serializes into one task. Chunked, the window partitions by
    (uuid, time-chunk) — parallelism = streams x chunks — and a second,
    chunk-count-sized pass carries the last point across chunk
    boundaries. Output is bit-identical for any chunk_width: equal sort
    keys always land in the same chunk, so the tie rules never straddle
    a boundary.
    """
    if strict is None:
        strict = not forward
    # sort key: negate time for the forward direction so one "look back"
    # window serves both; is_probe DESC puts the probe before same-key
    # points (strict backward) — and for forward, after negation, a
    # same-time point must WIN (inclusive), which the negated-value sort
    # preserves by ordering points (is_probe=0) after... see tie note.
    sgn = -1 if forward else 1
    pts = points.select(
        "uuid",
        (F.col("time") * sgn).alias("k"),
        F.col("time").alias("pt_time"),
        "value",
        F.lit(0).alias("is_probe"),
    )
    prb = probes.select(
        "uuid",
        (F.col("t") * sgn).alias("k"),
        F.lit(None).cast("long").alias("pt_time"),
        F.lit(None).cast("double").alias("value"),
        F.lit(1).alias("is_probe"),
    )
    # strict: probe sorts first at equal k -> same-time point excluded;
    # inclusive: point first -> included. Holds in both directions.
    tie = F.col("is_probe").desc() if strict else F.col("is_probe").asc()
    if chunk_width is None:
        w = (
            Window.partitionBy("uuid")
            .orderBy(F.col("k").asc(), tie, F.col("value").asc_nulls_first())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        u = pts.unionByName(prb).select(
            "uuid",
            "k",
            "is_probe",
            F.last("pt_time", ignorenulls=True).over(w).alias("asof_time"),
            F.last("value", ignorenulls=True).over(w).alias("asof_value"),
        )
        return (
            u.filter(F.col("is_probe") == 1)
            .select((F.col("k") * sgn).alias("t"), "uuid", "asof_time", "asof_value")
            .select("uuid", "t", "asof_time", "asof_value")
            .orderBy("uuid", "t")
        )
    # --- two-pass chunked plan ---
    u = pts.unionByName(prb).withColumn(
        "chunk", floor_div(F.col("k"), F.lit(chunk_width).cast("long"))
    )
    # pass 1: within-chunk look-back (same ordering, narrower partition)
    wl = (
        Window.partitionBy("uuid", "chunk")
        .orderBy(F.col("k").asc(), tie, F.col("value").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = u.select(
        "uuid",
        "chunk",
        "k",
        "is_probe",
        F.last("pt_time", ignorenulls=True).over(wl).alias("l_time"),
        F.last("value", ignorenulls=True).over(wl).alias("l_value"),
    ).filter(F.col("is_probe") == 1)
    # pass 2: per (uuid, chunk) the LAST point under the in-chunk point
    # ordering (k asc, value asc) is max(struct(k, value)); its running
    # max over all STRICTLY EARLIER chunks is the boundary carry-in.
    # Chunk count is data-size/chunk_width — the per-uuid window here is
    # over chunk summaries, not points, so the skewed-stream serial work
    # is O(chunks), not O(points).
    summaries = (
        u.filter(F.col("is_probe") == 0)
        .groupBy("uuid", "chunk")
        .agg(F.max(F.struct("k", "value", "pt_time")).alias("lastp"))
    )
    # probe-only chunks still need a carry row: enumerate every chunk the
    # union touches, left-join the point summaries (max ignores nulls)
    chunks = u.select("uuid", "chunk").distinct()
    wc = (
        Window.partitionBy("uuid")
        .orderBy("chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        chunks.join(summaries, ["uuid", "chunk"], "left")
        .select("uuid", "chunk", F.max("lastp").over(wc).alias("carry"))
    )
    joined = local.join(carry, ["uuid", "chunk"], "left").select(
        "uuid",
        (F.col("k") * sgn).alias("t"),
        F.coalesce(F.col("l_time"), F.col("carry.pt_time")).alias("asof_time"),
        F.coalesce(F.col("l_value"), F.col("carry.value")).alias("asof_value"),
    )
    return joined.orderBy("uuid", "t")


def asof_join_tolerance(
    points: DataFrame,
    probes: DataFrame,
    tolerance: int,
    forward: bool = False,
    strict: bool | None = None,
    chunk_width: int | None = None,
) -> DataFrame:
    """As-of join with a max-staleness bound (pandas merge_asof
    `tolerance` parity): a match further than ``tolerance`` ns from the
    probe is nulled out — the standard guard against joining against
    stale telemetry. Pure post-projection over asof_join: same single
    window pass, no extra shuffle."""
    out = asof_join(points, probes, forward=forward, strict=strict, chunk_width=chunk_width)
    dist = F.abs(F.col("asof_time") - F.col("t"))
    ok = F.col("asof_time").isNotNull() & (dist <= tolerance)
    return out.select(
        "uuid",
        "t",
        F.when(ok, F.col("asof_time")).alias("asof_time"),
        F.when(ok, F.col("asof_value")).alias("asof_value"),
    )


def asof_tolerance_oracle_sql(
    points_sql: str,
    probes_sql: str,
    tolerance: int,
    forward: bool = False,
    strict: bool | None = None,
) -> str:
    inner = asof_oracle_sql(points_sql, probes_sql, forward=forward, strict=strict)
    return f"""
        SELECT uuid, t,
               CASE WHEN asof_time IS NOT NULL AND ABS(asof_time - t) <= {tolerance}
                    THEN asof_time END AS asof_time,
               CASE WHEN asof_time IS NOT NULL AND ABS(asof_time - t) <= {tolerance}
                    THEN asof_value END AS asof_value
        FROM ({inner}) q ORDER BY uuid, t
    """


def asof_oracle_sql(
    points_sql: str, probes_sql: str, forward: bool = False, strict: bool | None = None
) -> str:
    """DuckDB mirror: identical union + window formulation (not ASOF JOIN,
    whose equal-time tie choice among duplicate points is unspecified)."""
    if strict is None:
        strict = not forward
    sgn = -1 if forward else 1
    tie = "DESC" if strict else "ASC"
    return f"""
        WITH u AS (
            SELECT uuid, time * {sgn} AS k, time AS pt_time, value, 0 AS is_probe
            FROM {points_sql} p
            UNION ALL
            SELECT uuid, t * {sgn} AS k, NULL, NULL, 1 FROM {probes_sql} pr
        ), w AS (
            SELECT uuid, k, is_probe,
                   LAST_VALUE(pt_time IGNORE NULLS) OVER (
                       PARTITION BY uuid ORDER BY k ASC, is_probe {tie}, value ASC NULLS FIRST
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_time,
                   LAST_VALUE(value IGNORE NULLS) OVER (
                       PARTITION BY uuid ORDER BY k ASC, is_probe {tie}, value ASC NULLS FIRST
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_value
            FROM u
        )
        SELECT uuid, k * {sgn} AS t, asof_time, asof_value
        FROM w WHERE is_probe = 1
        ORDER BY uuid, t
    """
