"""Statistical window queries (A1 AlignedWindows, A2 Windows).

Reference semantics:
- AlignedWindows (A1): tumbling windows of width 2^pw ns aligned to absolute
  zero. start/end are snapped DOWN to the grid, end becomes inclusive
  (quasar.go:279-283: ``start &^= (1<<pw)-1; end &^= ...; end -= 1``), i.e.
  the grouped range is snap(start) <= t < snap(end). Empty buckets are
  SKIPPED (qtree/qtree.go:878 count!=0 guard).
- Windows (A2): tumbling windows of arbitrary width anchored at `start`;
  end is rounded down to a whole number of windows (quasar.go:322-324);
  every window is emitted, zero-count holes included
  (qtree/qtree.go:1143-1173). The reference's `depth` knob trades accuracy
  for speed; this engine always answers exactly (a compatible superset).
  Divergence note: for a stream with no points at all the reference emits
  n-1 windows (qtree/qtree.go:1250 ``start+width < end`` quirk); we emit the
  full n for consistency.

Mean handling: the reference stores mean and recombines count-weighted
(merger.go:197). We aggregate sum as DECIMAL(38,6) so partial-aggregate
combines are exact and deterministic across engines, then expose
vmean = vsum/cnt (SURVEY.md §7 watch-list #3).

Scale notes: both queries are a single map-side-combinable groupBy on a
derived bucket column — one shuffle keyed (uuid, bucket), no window
functions, no driver loops. Hole emission joins against a generated
spark.range of window indexes (size = output rows, independent of data
volume); the per-stream window frame is broadcast. At 100 TB the same plan
answers from the rollup ladder (plans/rollup.py) instead of raw points when
the requested grain is coarser than a maintained level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.timeops import bucket_start, floor_div
from .raw import apply_deletes, at_version

DEC = "decimal(38,6)"


def _stat_aggs():
    """count/min/max plus the exact decimal sum as two primitive long
    sums (functions/decsum.py — bit-identical to sum(value::decimal) but
    allocation-free in the hot aggregation loop; measured 10-20x under a
    loaded JVM). Pair with :func:`_with_vmean` after the groupBy."""
    from ..functions import decsum

    return [
        F.count(F.lit(1)).alias("cnt"),
        F.min("value").alias("vmin"),
        *decsum.sum_aggs(F.col("value")),
        F.max("value").alias("vmax"),
    ]


def _with_vmean(agg: DataFrame) -> DataFrame:
    """vmean = exact-decimal vsum / cnt; drops the internal sum columns."""
    from ..functions import decsum

    return agg.withColumn(
        "vmean", decsum.vsum().cast("double") / F.col("cnt")
    ).drop("_ds_hi", "_ds_lo")


def aligned_windows(
    points: DataFrame,
    uuid: str | None,
    start: int,
    end: int,
    pw: int,
    version: int | None = None,
    deletes: DataFrame | None = None,
) -> DataFrame:
    """A1: per non-empty 2^pw bucket -> (uuid, bucket_start, cnt, vmin, vmean, vmax)."""
    if not (0 <= pw <= 63):
        raise ValueError(f"pointwidth out of range: {pw}")
    width = 1 << pw
    snap_s = start - (start % width + width) % width
    snap_e = end - (end % width + width) % width
    df = apply_deletes(at_version(points, version), deletes, version)
    if uuid is not None:
        df = df.filter(F.col("uuid") == F.lit(uuid))
    df = df.filter((F.col("time") >= F.lit(snap_s)) & (F.col("time") < F.lit(snap_e)))
    out = _with_vmean(
        df.withColumn("bucket_start", bucket_start(F.col("time"), width))
        .groupBy("uuid", "bucket_start")
        .agg(*_stat_aggs())
    )
    return out.select("uuid", "bucket_start", "cnt", "vmin", "vmean", "vmax").orderBy(
        "uuid", "bucket_start"
    )


def windows(
    points: DataFrame,
    uuid: str | None,
    start: int,
    end: int,
    width: int,
    version: int | None = None,
    deletes: DataFrame | None = None,
) -> DataFrame:
    """A2: every width-ns window anchored at start; zero-count holes emitted.

    Returns (uuid, window_start, cnt, vmin, vmean, vmax) with NULL stats for
    holes. Streams with no points in any window emit nothing (matching the
    reference, which emits nothing when the stream has no data >= start and
    never activates — qtree/qtree.go:1190-1235).
    """
    if width <= 0:
        raise ValueError("width must be positive")
    end = end - (end - start) % width  # quasar.go:322-324
    n_windows = (end - start) // width
    if n_windows <= 0:
        raise ValueError("empty window range")
    df = apply_deletes(at_version(points, version), deletes, version)
    if uuid is not None:
        df = df.filter(F.col("uuid") == F.lit(uuid))
    df = df.filter((F.col("time") >= F.lit(start)) & (F.col("time") < F.lit(end)))
    spark = points.sparkSession
    agg = _with_vmean(
        df.withColumn("widx", floor_div(F.col("time") - F.lit(start), F.lit(width).cast("long")))
        .groupBy("uuid", "widx")
        .agg(*_stat_aggs())
    )
    # Window frame: every (uuid, widx) pair for streams that have any data in
    # range. Row count = streams x windows (output-sized, tiny), broadcast.
    uuids = df.select("uuid").distinct()
    frame = F.broadcast(uuids).crossJoin(
        spark.range(n_windows).select(F.col("id").alias("widx"))
    )
    out = frame.join(agg, on=["uuid", "widx"], how="left").select(
        F.col("uuid"),
        (F.lit(start) + F.col("widx") * F.lit(width)).cast("long").alias("window_start"),
        F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("cnt"),
        "vmin",
        "vmean",
        "vmax",
    )
    return out.orderBy("uuid", "window_start")


def windows_sliding(
    points: DataFrame,
    uuid: str | None,
    start: int,
    end: int,
    width: int,
    hop: int,
) -> DataFrame:
    """Sliding stat windows: width-ns windows anchored every hop ns
    (hop < width => overlapping). The reference's Windows is the hop ==
    width special case; overlapping windows are the standard smoothing /
    alert-evaluation shape its users build client-side.

    Each point contributes to ceil(width/hop) windows: a bounded explode
    of window indices followed by ONE partial-aggregated groupBy — never
    a per-window scan (width/hop passes) and never a range join. Windows
    are emitted only where they have data (sparse output, like A1);
    window_start ranges over [start, end - width] on the hop grid.

    Output: (uuid, window_start, cnt, vmin, vmean, vmax).
    """
    if width <= 0 or hop <= 0:
        raise ValueError("width and hop must be positive")
    last_anchor = (end - width - start) // hop  # max k with window inside range
    if last_anchor < 0:
        raise ValueError("empty window range")
    df = points
    if uuid is not None:
        df = df.filter(F.col("uuid") == F.lit(uuid))
    df = df.filter((F.col("time") >= F.lit(start)) & (F.col("time") < F.lit(end)))
    t = F.col("time") - F.lit(start)
    # window k covers t iff k*hop <= t < k*hop + width; k_min is a ceil
    # division kept on NON-NEGATIVE ints so floor/truncate conventions
    # can't diverge between engines (DuckDB // truncates toward zero)
    k_min = floor_div(
        F.greatest(t - F.lit(width) + F.lit(1), F.lit(0).cast("long"))
        + F.lit(hop - 1),
        F.lit(hop),
    )
    k_max = F.least(floor_div(t, F.lit(hop)), F.lit(last_anchor).cast("long"))
    # Guard: F.sequence(a, b) with a > b yields a DESCENDING sequence (step
    # defaults to -1), not an empty array. k_min > k_max is reachable when
    # width < hop (points falling in the gap between windows) and for points
    # past last_anchor's window on an unaligned range — those rows cover no
    # window and must produce no k at all.
    ks = F.when(k_min <= k_max, F.sequence(k_min, k_max)).otherwise(
        F.array().cast("array<long>")
    )
    out = (
        _with_vmean(
            df.select("uuid", "value", F.explode(ks).alias("k"))
            .groupBy("uuid", "k")
            .agg(*_stat_aggs())
        )
        .select(
            "uuid",
            (F.lit(start) + F.col("k") * F.lit(hop)).cast("long").alias("window_start"),
            "cnt",
            "vmin",
            "vmean",
            "vmax",
        )
    )
    return out.orderBy("uuid", "window_start")


def windows_sliding_oracle_sql(
    points_sql: str, mean_sql: str, start: int, end: int, width: int, hop: int
) -> str:
    last_anchor = (end - width - start) // hop
    return f"""
        WITH inr AS (
            SELECT uuid, time - {start} AS t, value FROM {points_sql} p
            WHERE time >= {start} AND time < {end}
        ), ks AS (
            SELECT uuid, value,
                   UNNEST(generate_series(
                       (GREATEST(t - {width} + 1, 0) + {hop - 1}) // {hop},
                       LEAST(t // {hop}, {last_anchor}))) AS k
            FROM inr
        )
        SELECT uuid, CAST({start} + k * {hop} AS BIGINT) AS window_start,
               COUNT(*) AS cnt, MIN(value) AS vmin, {mean_sql} AS vmean, MAX(value) AS vmax
        FROM ks GROUP BY uuid, k ORDER BY uuid, window_start
    """


def ohlc_bars(points: DataFrame, pw: int = 45) -> DataFrame:
    """Open/high/low/close bars per (uuid, 2^pw bucket) — the candlestick
    aggregation every monitoring and market-data stack runs; also the
    lossless-envelope sibling of decimate_minmax (open/close preserve the
    bucket's boundary behavior, high/low its extremes).

    Deterministic tie rules: open = value of the EARLIEST (time, value)
    point, close = value of the LATEST (time, value) point, ties on time
    break by value inside the struct order. One map-side-combinable
    groupBy (min/max over structs), no window sort anywhere.
    """
    from ..functions.timeops import bucket_start as _bs

    width = 1 << pw
    agg = (
        points.withColumn("bucket_start", _bs(F.col("time"), width))
        .groupBy("uuid", "bucket_start")
        .agg(
            F.min(F.struct(F.col("time"), F.col("value"))).alias("first"),
            F.max(F.struct(F.col("time"), F.col("value"))).alias("last"),
            F.min("value").alias("low"),
            F.max("value").alias("high"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )
    return agg.select(
        "uuid",
        "bucket_start",
        F.col("first.value").alias("open"),
        "high",
        "low",
        F.col("last.value").alias("close"),
        F.col("cnt").cast("long").alias("cnt"),
    ).orderBy("uuid", "bucket_start")


def ohlc_oracle_sql(points_sql: str, pw: int = 45) -> str:
    w = 1 << pw
    return f"""
        WITH b AS (
            SELECT uuid, time, value,
                   time - ((time % {w} + {w}) % {w}) AS bucket_start
            FROM {points_sql} p
        ), r AS (
            SELECT uuid, bucket_start, time, value,
                   ROW_NUMBER() OVER (PARTITION BY uuid, bucket_start
                                      ORDER BY time ASC, value ASC) AS rf,
                   ROW_NUMBER() OVER (PARTITION BY uuid, bucket_start
                                      ORDER BY time DESC, value DESC) AS rl
            FROM b
        )
        SELECT uuid, bucket_start,
               MIN(CASE WHEN rf = 1 THEN value END) AS open,
               MAX(value) AS high,
               MIN(value) AS low,
               MIN(CASE WHEN rl = 1 THEN value END) AS close,
               COUNT(*) AS cnt
        FROM r GROUP BY uuid, bucket_start
        ORDER BY uuid, bucket_start
    """
