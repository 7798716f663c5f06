"""Stream metadata plane (SURVEY.md §2.11 M1-M6).

The reference keeps stream descriptors in etcd with secondary indexes and a
leapfrog intersection for tag lookups (internal/mprovider/lookup.go:56-292).
Here the descriptors are a streams DataFrame (schemas.STREAMS_SCHEMA); a
single conjunctive filter expresses the same lookup — Catalyst turns the
map-key predicates into one scan, no index machinery needed. The streams
table is dimension-sized (millions of rows at most), so every join against
it broadcasts.

Validation rules mirror internal/mprovider/metaprovider.go:18-47.
"""

from __future__ import annotations

import re
from collections.abc import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KEY_RE = re.compile(r"^[a-z][a-z0-9_.]*$")
MAX_COLLECTION_BYTES = 256
MAX_KEY_BYTES = 64
MAX_VALUE_BYTES = 256
MAX_TAGS = 32
MAX_ANNOTATIONS = 64
MAX_LIST_COLLECTIONS = 10000  # metaprovider.go:24


def validate_collection(collection: str) -> None:
    if not collection or len(collection.encode()) > MAX_COLLECTION_BYTES or "\x00" in collection:
        raise ValueError(f"invalid collection: {collection!r}")


def validate_kv(m: Mapping[str, str | None], max_entries: int, what: str) -> None:
    if len(m) > max_entries:
        raise ValueError(f"too many {what}: {len(m)} > {max_entries}")
    for k, v in m.items():
        if not KEY_RE.match(k) or len(k.encode()) > MAX_KEY_BYTES:
            raise ValueError(f"invalid {what} key: {k!r}")
        if v is not None and len(v.encode()) > MAX_VALUE_BYTES:
            raise ValueError(f"{what} value too long for key {k!r}")


def live(streams: DataFrame) -> DataFrame:
    return streams.filter(F.col("tombstoned").isNull())


def list_collections(
    streams: DataFrame,
    prefix: str = "",
    starting_from: str = "",
    limit: int = MAX_LIST_COLLECTIONS,
) -> DataFrame:
    """M4: paginated sorted prefix scan of distinct collections."""
    limit = min(limit, MAX_LIST_COLLECTIONS) if limit else MAX_LIST_COLLECTIONS
    df = live(streams).select("collection").distinct()
    if prefix:
        df = df.filter(F.col("collection").startswith(prefix))
    if starting_from:
        df = df.filter(F.col("collection") >= F.lit(starting_from))
    return df.orderBy("collection").limit(limit)


def lookup_streams(
    streams: DataFrame,
    collection: str | None = None,
    is_prefix: bool = False,
    tags: Mapping[str, str | None] | None = None,
    annotations: Mapping[str, str | None] | None = None,
) -> DataFrame:
    """M5: streams matching collection AND tag AND annotation predicates.

    A predicate value of None means key-exists (lookup.go:209-292).
    """
    df = live(streams)
    if collection is not None:
        if is_prefix:
            df = df.filter(F.col("collection").startswith(collection))
        else:
            df = df.filter(F.col("collection") == F.lit(collection))
    for col, preds in (("tags", tags), ("annotations", annotations)):
        for k, v in (preds or {}).items():
            if v is None:
                df = df.filter(F.map_contains_key(F.col(col), F.lit(k)))
            else:
                df = df.filter(F.col(col)[k] == F.lit(v))
    return df.orderBy("uuid")


def key_usage(streams: DataFrame, prefix: str = "") -> DataFrame:
    """M6/A7: per-key stream counts for tags and annotations under a prefix."""
    df = live(streams)
    if prefix:
        df = df.filter(F.col("collection").startswith(prefix))
    tag_counts = (
        df.select(F.explode(F.map_keys("tags")).alias("key"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("kind", F.lit("tag"))
    )
    ann_counts = (
        df.select(F.explode(F.map_keys("annotations")).alias("key"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("kind", F.lit("annotation"))
    )
    return tag_counts.unionByName(ann_counts).orderBy("kind", "key")
