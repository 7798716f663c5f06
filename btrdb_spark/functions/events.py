"""Behavioral-event analytics: semi-structured property extraction and
funnel analysis over the events stream.

These extend the engine beyond the reference's (time, value) data plane
(SURVEY §1.1 — BTrDB has no event-typed or semi-structured payloads) to
the event-log shape every training-data/telemetry pipeline also carries.

Scale shape:
- ``props_extract_stats``: JSON field extraction is a pure codegen'd
  projection (get_json_object runs JVM-side); the rollup is one
  partial-aggregated groupBy on event_type — a handful of keys, with
  map-side combine doing almost all the work, so the reduce side is
  trivially small even at 100 TB.
- ``event_funnel``: one shuffle on user_id, then THREE window passes over
  the same partitioning (Spark reuses the exchange — no second shuffle;
  verify with .explain: a single Exchange feeds stacked Window nodes).
  The per-user state is O(1) (three timestamps), never a collected list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def props_extract_stats(events_ns: DataFrame) -> DataFrame:
    """Extract the integer `k` field from the JSON `props` column and
    roll up per event_type.

    Input: events with `time_ns` (sources.tables.events_with_time_ns).
    Output: (event_type, n_events, sum_k, min_k, max_k, avg_k), ordered
    by event_type. avg_k is a single double division of exact int sums,
    so the DuckDB oracle matches bit-for-bit.
    """
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        events_ns.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            (F.sum("k").cast("double") / F.count(F.lit(1))).alias("avg_k"),
        )
        .orderBy("event_type")
    )


PROPS_EXTRACT_ORACLE = """
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           MIN(k) AS min_k,
           MAX(k) AS max_k,
           CAST(SUM(k) AS DOUBLE) / COUNT(*) AS avg_k
    FROM (SELECT event_type,
                 CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
          FROM events)
    GROUP BY event_type ORDER BY event_type
"""


def event_funnel(events_ns: DataFrame) -> DataFrame:
    """Ordered conversion funnel view -> click -> purchase per user.

    Stage timestamps are causal: first_click is the earliest click AT OR
    AFTER the user's first view, first_purchase the earliest purchase at
    or after that click. Users with no view have all stages NULL (they
    appear — the output covers every user, which is what a conversion
    denominator needs).

    Output: (uuid, first_view, first_click, first_purchase) with uuid =
    user_id as string and ns timestamps, ordered by uuid.
    """
    w = Window.partitionBy("user_id")
    staged = (
        events_ns.select("user_id", "event_type", F.col("time_ns").alias("t"))
        .withColumn(
            "first_view",
            F.min(F.when(F.col("event_type") == "view", F.col("t"))).over(w),
        )
        .withColumn(
            "first_click",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("t") >= F.col("first_view")),
                    F.col("t"),
                )
            ).over(w),
        )
        .withColumn(
            "first_purchase",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("t") >= F.col("first_click")),
                    F.col("t"),
                )
            ).over(w),
        )
    )
    return (
        staged.groupBy("user_id")
        .agg(
            F.first("first_view").alias("first_view"),
            F.first("first_click").alias("first_click"),
            F.first("first_purchase").alias("first_purchase"),
        )
        .select(
            F.col("user_id").cast("string").alias("uuid"),
            "first_view",
            "first_click",
            "first_purchase",
        )
        .orderBy("uuid")
    )


def cohort_retention(events_ns: DataFrame, epoch: int, week: int) -> DataFrame:
    """Weekly cohort retention matrix: users grouped by first-activity
    week; for each (cohort, week offset), how many of them were active.

    One shuffle on user_id (window min for the cohort week), one
    partial-aggregated distinct on (user, week), then a tiny rollup —
    the matrix is cohorts x offsets, dashboard-sized, regardless of the
    event volume feeding it.

    Output: (cohort_week, week_offset, n_users), ordered.
    """
    w = Window.partitionBy("user_id")
    weeks = events_ns.select(
        "user_id",
        floor_div_col(F.col("time_ns") - F.lit(epoch), week).alias("week"),
    )
    staged = weeks.withColumn("cohort_week", F.min("week").over(w))
    return (
        staged.select("user_id", "cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .distinct()
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


def floor_div_col(num: "F.Column", den: int) -> "F.Column":
    from ..functions.timeops import floor_div

    return floor_div(num, F.lit(den).cast("long"))


def cohort_retention_oracle_sql(epoch: int, week: int) -> str:
    # times are >= epoch in the fixture, so integer // (truncating in
    # DuckDB) equals floor division here; the Spark side uses floor_div
    # on the same non-negative values
    return f"""
        WITH weeks AS (
            SELECT user_id, (epoch_ns(ts) - {epoch}) // {week} AS week
            FROM events
        ), staged AS (
            SELECT user_id, week,
                   MIN(week) OVER (PARTITION BY user_id) AS cohort_week
            FROM weeks
        )
        SELECT cohort_week, week_offset, COUNT(*) AS n_users
        FROM (SELECT DISTINCT user_id, cohort_week, week - cohort_week AS week_offset
              FROM staged)
        GROUP BY cohort_week, week_offset
        ORDER BY cohort_week, week_offset
    """


FUNNEL_ORACLE = """
    WITH e AS (
        SELECT user_id, event_type, epoch_ns(ts) AS t FROM events
    ), s1 AS (
        SELECT *, MIN(CASE WHEN event_type = 'view' THEN t END)
                      OVER (PARTITION BY user_id) AS first_view
        FROM e
    ), s2 AS (
        SELECT *, MIN(CASE WHEN event_type = 'click' AND t >= first_view THEN t END)
                      OVER (PARTITION BY user_id) AS first_click
        FROM s1
    ), s3 AS (
        SELECT *, MIN(CASE WHEN event_type = 'purchase' AND t >= first_click THEN t END)
                      OVER (PARTITION BY user_id) AS first_purchase
        FROM s2
    )
    SELECT CAST(user_id AS VARCHAR) AS uuid,
           ANY_VALUE(first_view) AS first_view,
           ANY_VALUE(first_click) AS first_click,
           ANY_VALUE(first_purchase) AS first_purchase
    FROM s3 GROUP BY user_id ORDER BY uuid
"""


def sliding_distinct_users(
    events_ns: DataFrame, width: int, hop: int, start: int, end: int
) -> DataFrame:
    """Distinct active users per sliding window [w, w+width) every
    ``hop`` ns — the rolling-DAU/MAU query of every product dashboard.

    Each event lands in at most width/hop windows (bounded explode of the
    window starts containing it — the windows_sliding shape), then ONE
    countDistinct groupBy; no self-join, no per-window rescan. At scale
    the explode factor is the window/hop ratio — a constant.

    Output: (window_start, n_users, n_events), ordered.
    """
    # window starts covering time t: hop-aligned starts in (t-width, t].
    # That's ceil(width/hop) candidates (floor undercounts when hop does
    # not divide width — ADVICE r4: width=10, hop=4 dropped the earliest
    # covering window); the covering filter below trims the one candidate
    # that can fall at or before t-width.
    k = -(-width // hop)
    last = F.col("time_ns") - ((F.col("time_ns") % hop + hop) % hop)
    starts = F.sequence(last - F.lit((k - 1) * hop), last, F.lit(hop))
    win = (
        events_ns.filter(
            (F.col("time_ns") >= F.lit(start)) & (F.col("time_ns") < F.lit(end))
        )
        .select(
            F.col("user_id"),
            F.col("time_ns"),
            F.explode(starts).alias("window_start"),
        )
        .filter(F.col("window_start") + F.lit(width) > F.col("time_ns"))
        .filter(
            (F.col("window_start") >= F.lit(start))
            & (F.col("window_start") + F.lit(width) <= F.lit(end))
        )
        .groupBy("window_start")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    return win.select(
        "window_start",
        F.col("n_users").cast("long").alias("n_users"),
        F.col("n_events").cast("long").alias("n_events"),
    ).orderBy("window_start")


def sliding_distinct_users_oracle_sql(
    width: int, hop: int, start: int, end: int
) -> str:
    k = -(-width // hop)  # ceil: every covering window, even when hop % width
    return f"""
        WITH e AS (
            SELECT user_id, epoch_ns(ts) AS t FROM events
            WHERE epoch_ns(ts) >= {start} AND epoch_ns(ts) < {end}
        ), w AS (
            SELECT user_id, t,
                   (t - ((t % {hop} + {hop}) % {hop})) - s.i * {hop} AS window_start
            FROM e, unnest(range(0, {k})) s(i)
        )
        SELECT window_start,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM w
        WHERE window_start + {width} > t
          AND window_start >= {start} AND window_start + {width} <= {end}
        GROUP BY window_start ORDER BY window_start
    """
