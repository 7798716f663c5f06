"""Parquet table loaders for the driver's test data.

At cluster scale the points table would be written partitioned by
(uuid_bucket, time_bucket) so uuid/time predicates prune partitions before
the parquet min/max skipping even runs (SURVEY.md §1.3). The driver's test
parquet is a single unpartitioned file; the loaders keep the read path
declarative (spark.read.parquet) so Catalyst pushdown works either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # The events parquet stores TIMESTAMP(NANOS); Spark 4 refuses it
        # unless nanos are surfaced as raw int64 ns (runtime-settable).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def events_as_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map the driver's `events` table onto the canonical points shape.

    Per FIXTURES.md §6: key column -> uuid, timestamp -> time (ns),
    metric -> value. A deterministic synthetic `version` (10 + event_id % 7)
    gives a multi-version history for the versioning operators (the
    reference's first-data version is 10 — internal/bprovider/bprovider.go:33).

    DuckDB oracle mirror (see __spark_entry__.PTS):
      SELECT CAST(user_id AS VARCHAR) uuid, epoch_ns(ts) time, value,
             10 + (event_id % 7) version FROM events
    """
    ev = events_with_time_ns(spark, sf_dir)
    return ev.select(
        F.col("user_id").cast("string").alias("uuid"),
        F.col("time_ns").alias("time"),
        F.col("value").alias("value"),
        (F.lit(10) + F.col("event_id") % F.lit(7)).cast("long").alias("version"),
    )


def events_with_time_ns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw events table plus a `time_ns` long column (epoch ns,
    truncated to µs precision to match DuckDB's epoch_ns(ts)). Keeps the
    full event payload (event_type, props) for the behavioral-analytics
    operators (funnel, sessionize, json extraction)."""
    ev = load_table(spark, sf_dir, "events")
    # The driver has shipped `ts` two ways across testdata generations:
    # TIMESTAMP(NANOS) (surfaced as raw int64 ns via nanosAsLong) and
    # plain timestamp[us] (TIMESTAMP_NTZ to Spark 4, which refuses a
    # direct numeric cast). Adapt on the read schema; both roads end at
    # int64 ns truncated to µs — exactly what DuckDB's epoch_ns(ts)
    # yields on its µs-native timestamps (session tz is UTC, so NTZ→LTZ
    # is identity). The conversion expression blocks parquet predicate
    # pushdown on this FIXTURE adapter — the engine's canonical storage
    # stores `time` as a physical long column (engine.py), where range
    # predicates do push down (asserted in tools/explain_audit.py); this
    # adapter exists only to map the driver's fixture.
    ts_type = dict(ev.dtypes)["ts"]
    if ts_type in ("timestamp", "timestamp_ntz"):
        t = F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000)
    else:
        t = F.col("ts").cast("long")
        t = t - F.pmod(t, F.lit(1000))
    return ev.select("*", t.alias("time_ns"))
