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


def test_hll_accuracy(spark, keyed):
    out = sketches.distinct_hll(keyed, ["shard"], "key", b=9).collect()
    assert [r["shard"] for r in out] == [0, 1, 2]
    for r in out:
        # raw-estimator regime: 4000 distinct >> 2.5 * 512; rel error
        # ~1.04/sqrt(512) = 4.6%, allow 4 sigma
        assert abs(r["est_hll"] - 4000) / 4000 < 0.2
        assert 0 <= r["zero_registers"] < 512


def test_hll_merge_law_exact(spark, keyed):
    """Element-wise-MAX-merged per-shard registers must give the
    IDENTICAL estimate as the direct global sketch — exactly."""
    merged = sketches.distinct_hll_merged(keyed, ["shard"], "key", b=9).collect()[0]
    direct = sketches.distinct_hll(
        keyed.withColumn("g", F.lit(0)), ["g"], "key", b=9
    ).collect()[0]
    assert merged["est_hll"] == direct["est_hll"]
    assert merged["zero_registers"] == direct["zero_registers"]
    assert merged["n_exact"] == 8000
    assert abs(merged["est_hll"] - 8000) / 8000 < 0.2


def test_bloom_no_false_negatives(spark):
    # corpus doc 0 shares its full text with eval doc 100; docs 1..9 are
    # disjoint word streams -> doc 0 MUST be flagged on every gram
    mk = F.concat_ws(
        " ", *[F.concat(F.lit(f"w"), ((F.col("doc_id") + F.lit(0)) * 20 + F.lit(j)).cast("string")) for j in range(12)]
    )
    corpus = spark.range(10).select(F.col("id").alias("doc_id"), mk.alias("text"))
    eval_docs = corpus.filter(F.col("doc_id") == 0).select(
        (F.col("doc_id") + 100).alias("doc_id"), "text"
    )
    out = sketches.bloom_decontaminate(corpus, eval_docs, n=8).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert 0 in by_id  # never misses true contamination
    r0 = by_id[0]
    assert r0["flagged_grams"] == r0["n_grams"] == 5  # 12 tokens, n=8 -> 5 grams
    assert r0["flagged_frac"] == 1.0
    # one-sided: any other flagged doc would be a (vanishingly rare at
    # this load factor) false positive; assert none here
    assert set(by_id) == {0}


def test_sample_quantiles_merge_and_accuracy(spark, keyed):
    # values = key itself: true p50 of 0..7999 distinct keys x weights...
    # keyed has 12000 rows with values 0..7999 (overlap duplicated);
    # sample quantiles approximate the ROW distribution
    df = keyed.withColumn("v", F.col("key").cast("double"))
    out = sketches.sample_quantiles_merged(
        df, ["shard"], "v", ["shard", "key"], k=512
    ).collect()[0]
    assert out["n_sample"] == 512
    # row-distribution p50 is 4000 +- rank error ~3/sqrt(512)
    assert abs(out["p50"] - 4000) < 800
    assert out["p90"] > out["p50"] and out["p99"] >= out["p90"]
    # merge law: per-shard samples re-ranked == direct global sample
    direct = sketches.sample_quantiles_merged(
        df.withColumn("g", F.lit(0)), ["g"], "v", ["shard", "key"], k=512
    ).collect()[0]
    assert (out["p50"], out["p90"], out["p99"]) == (
        direct["p50"], direct["p90"], direct["p99"]
    )


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


def test_sample_quantiles_by_group_merge_law(spark, keyed):
    # two groups with disjoint value ranges; grouped sketch must keep
    # them separate and match the direct per-group sample
    df = keyed.withColumn("g", (F.col("key") % 2).cast("string")).withColumn(
        "v", F.col("key").cast("double")
    )
    out = sketches.sample_quantiles_by_group(
        df, ["g"], ["shard"], "v", ["shard", "key"], k=128
    ).collect()
    assert len(out) == 2
    for r in out:
        assert r["n_sample"] == 128
        assert r["p50"] < r["p90"] <= r["p99"]
    # merge law per group: single-shard draw == multi-shard merged draw
    direct = sketches.sample_quantiles_by_group(
        df.withColumn("one", F.lit(0)), ["g"], ["one"], "v", ["shard", "key"], k=128
    ).collect()
    assert {(r["g"], r["p50"], r["p90"], r["p99"]) for r in out} == {
        (r["g"], r["p50"], r["p90"], r["p99"]) for r in direct
    }


def test_source_jaccard_kmv_estimates_overlap(spark):
    # A and B share half their docs' shingles; C is disjoint. With the
    # union under k the estimator is EXACT Jaccard.
    def mk(src, lo, hi):
        return [
            (src, f"tok{i} tok{i+1} tok{i+2} tok{i+3} tok{i+4}")
            for i in range(lo, hi)
        ]

    docs = spark.createDataFrame(
        mk("A", 0, 40) + mk("B", 20, 60) + mk("C", 1000, 1040),
        "source string, text string",
    )
    out = sketches.source_jaccard_kmv(docs, n=3, k=4096).collect()
    j = {(r["source_a"], r["source_b"]): r for r in out}
    ab = j[("A", "B")]
    # exactness claim: estimator == true jaccard of the shingle SETS
    # computed independently
    def grams(lo, hi):
        g = set()
        for i in range(lo, hi):
            toks = [f"tok{i+d}" for d in range(5)]
            for s in range(3):
                g.add(" ".join(toks[s:s+3]))
        return g
    ga, gb, gc = grams(0, 40), grams(20, 60), grams(1000, 1040)
    true_ab = len(ga & gb) / len(ga | gb)
    assert ab["est_jaccard"] == pytest.approx(true_ab, abs=0)
    assert j[("A", "C")]["n_shared"] == 0 and j[("B", "C")]["n_shared"] == 0
    # sketch regime (k < union): estimate within ~3/sqrt(k) of truth
    small = sketches.source_jaccard_kmv(docs, n=3, k=64).collect()
    ab_s = {(r["source_a"], r["source_b"]): r for r in small}[("A", "B")]
    assert abs(ab_s["est_jaccard"] - true_ab) < 3 / (64 ** 0.5)
