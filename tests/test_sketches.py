"""Mergeable sketches (functions/sketches.py): KMV distinct estimation,
the bottom-k merge law, and count-min heavy hitters."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from btrdb_spark.functions import sketches


@pytest.fixture(scope="module")
def keyed(spark):
    # 3 shards x overlapping key ranges: shard 0 -> 0..3999,
    # shard 1 -> 2000..5999, shard 2 -> 4000..7999 (8000 distinct total)
    return spark.range(12000).select(
        (F.col("id") / 4000).cast("long").alias("shard"),
        (F.col("id") % 4000 + (F.col("id") / 4000).cast("long") * 2000).alias("key"),
    )


def test_kmv_accuracy_and_small_set_exact(spark, keyed):
    out = sketches.distinct_kmv(keyed, ["shard"], "key", k=256).collect()
    assert [r["shard"] for r in out] == [0, 1, 2]
    for r in out:
        assert r["n_exact"] == 4000
        assert abs(r["est_distinct"] - 4000) / 4000 < 0.2  # ~1/sqrt(k)
    # below k the sketch IS the exact set
    small = spark.range(50).select(F.lit(0).alias("g"), F.col("id").alias("key"))
    row = sketches.distinct_kmv(small, ["g"], "key", k=256).collect()[0]
    assert row["est_distinct"] == 50.0 and row["n_exact"] == 50


def test_kmv_merge_law_exact(spark, keyed):
    """Merging per-shard bottom-k sketches must give the IDENTICAL
    estimate as the direct global sketch — not approximately, exactly."""
    merged = sketches.distinct_kmv_merged(keyed, ["shard"], "key", k=128).collect()[0]
    direct = sketches.distinct_kmv(
        keyed.withColumn("g", F.lit(0)), ["g"], "key", k=128
    ).collect()[0]
    assert merged["est_distinct"] == direct["est_distinct"]
    assert merged["n_exact"] == 8000
    assert abs(merged["est_distinct"] - 8000) / 8000 < 0.25


def test_cms_overestimates_and_finds_heavy_hitters(spark):
    # 'alpha' appears 300x, 'beta' 150x, tail tokens once each
    docs = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("alpha "),
            F.when(F.col("id") < 150, F.lit("beta ")).otherwise(F.lit("")),
            F.concat(F.lit("tail"), F.col("id").cast("string")),
        ).alias("text"),
    )
    out = sketches.cms_heavy_hitters(docs, topk=5).collect()
    est = {r["token"]: r["est_count"] for r in out}
    assert list(est)[0] == "alpha"
    assert est["alpha"] >= 300 and est["beta"] >= 150  # one-sided error
    assert est["alpha"] <= 300 + 2 * 750 // 1024 + 5  # d-row min stays tight
    # ordering deterministic: est desc then token asc
    ranks = [(r["est_count"], r["token"]) for r in out]
    assert ranks == sorted(ranks, key=lambda p: (-p[0], p[1]))
