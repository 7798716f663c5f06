"""Round-6 operator tests: weighted sampling, SymSpell fuzzy pairs,
reciprocal-rank-fusion hybrid retrieval."""

import pytest
from pyspark.sql import functions as F

from btrdb_spark.functions import dedup, pipeline, similarity, text


def test_weighted_sample_proportional_and_deterministic(spark):
    # doc 0 carries 90% of the mass; with 400 draws it must dominate
    docs = spark.createDataFrame(
        [(0, 9000), (1, 200), (2, 200), (3, 200), (4, 200), (5, 200)],
        "doc_id long, n_chars long",
    )
    out = pipeline.weighted_sample(docs, n_draws=400, salt="t1").collect()
    assert len(out) == 400  # every draw resolves to exactly one interval
    counts = {}
    for r in out:
        counts[r["doc_id"]] = counts.get(r["doc_id"], 0) + 1
    assert counts[0] > 300  # E=360, binomial sd ~6
    for d in range(1, 6):
        assert counts.get(d, 0) < 40  # E=8
    # reproducible: same salt -> identical draws; new salt -> different
    again = pipeline.weighted_sample(docs, n_draws=400, salt="t1").collect()
    assert [(r["draw_id"], r["doc_id"]) for r in out] == [
        (r["draw_id"], r["doc_id"]) for r in again
    ]
    other = pipeline.weighted_sample(docs, n_draws=400, salt="t2").collect()
    assert [(r["draw_id"], r["doc_id"]) for r in out] != [
        (r["draw_id"], r["doc_id"]) for r in other
    ]
    # zero-weight docs are never drawn
    docs0 = docs.withColumn(
        "n_chars", F.when(F.col("doc_id") == 5, F.lit(0)).otherwise(F.col("n_chars"))
    )
    out0 = pipeline.weighted_sample(docs0, n_draws=400, salt="t1").collect()
    assert all(r["doc_id"] != 5 for r in out0)


def test_weighted_sample_empty_weights_and_plan_shape(spark):
    # ADVICE r6: all-nonpositive weights must return an empty frame with
    # the declared schema, not crash on int(None)
    docs = spark.createDataFrame(
        [(0, 0), (1, -5)], "doc_id long, n_chars long"
    )
    out = pipeline.weighted_sample(docs, n_draws=16)
    assert out.columns == ["draw_id", "doc_id", "weight"]
    assert out.count() == 0
    # truly empty input too
    empty = pipeline.weighted_sample(docs.limit(0), n_draws=16)
    assert empty.count() == 0
    # VERDICT r6 #1: draw resolution must be bucket-keyed — no broadcast
    # nested-loop interval join anywhere in the physical plan
    big = spark.range(500).select(
        F.col("id").alias("doc_id"), (F.col("id") % 97 + 1).alias("n_chars")
    )
    plan = pipeline.weighted_sample(big, n_draws=64)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_fuzzy_prefix_pairs_distance_semantics(spark):
    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox"),
            (1, "the quick brown fox"),  # dist 0 to doc 0
            (2, "the quick brewn fox"),  # substitution: dist 1
            (3, "the quick brown foxx"),  # insertion: dist 1
            (4, "the quick brwn fx"),  # dist 2+ from all -> excluded
            (5, "ab"),
            (6, "ba"),  # dist 2 but SHARES a deletion variant -> must be verified out
        ],
        "doc_id long, text string",
    )
    rows = dedup.fuzzy_prefix_pairs(docs, prefix_len=32).collect()
    pairs = {(r["doc_id"], r["doc_id2"]): r["dist"] for r in rows}
    # star edge: doc 1 collapses onto representative 0 (identical prefix)
    assert pairs[(0, 1)] == 0
    # distance-1 relations are emitted once per DISTINCT prefix pair,
    # anchored at the representative — (1,2)/(1,3) are implied via 0
    assert pairs[(0, 2)] == 1 and pairs[(0, 3)] == 1
    assert (1, 2) not in pairs and (1, 3) not in pairs
    # 2<->3 differ by two edits; 4 matches nothing; ab/ba collide in the
    # candidate join but fail exact verification
    assert (2, 3) not in pairs
    assert all(4 not in p for p in pairs)
    assert (5, 6) not in pairs
    # output is linear in group size: a 100-doc identical-prefix group
    # emits 99 star rows, never C(100,2) clique rows
    blob = spark.createDataFrame(
        [(100 + i, "same leading words here") for i in range(100)],
        "doc_id long, text string",
    )
    out = dedup.fuzzy_prefix_pairs(blob, prefix_len=32).collect()
    assert len(out) == 99
    assert all(r["doc_id"] == 100 and r["dist"] == 0 for r in out)


def test_hybrid_rrf_fusion_math(spark):
    # docs 1..4: doc 2 is mid-rank in BOTH lists and must beat docs that
    # top only one list (the signature RRF property)
    docs = spark.createDataFrame(
        [
            (1, "spark spark spark spark"),  # lexical #1
            (2, "spark join filler filler"),  # lexical #2
            (3, "nothing relevant here"),
            (4, "unrelated text entirely"),
        ],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),  # probe
            (1, [0.0, 1.0]),  # orthogonal -> vector last
            (2, [0.9, 0.1]),  # vector #2
            (3, [1.0, 0.05]),  # vector #1
            (4, [0.5, 0.5]),
        ],
        "vec_id long, embedding array<double>",
    )
    out = similarity.hybrid_rrf_topk(
        docs, emb, terms=["spark", "join"], probe_id=0, k=4, depth=10
    ).collect()
    by_doc = {r["doc_id"]: r for r in out}
    # the fusion law holds exactly on every row (missing list -> 0 term)
    for r in out:
        want = (1 / (60 + r["rank_lex"]) if r["rank_lex"] else 0.0) + (
            1 / (60 + r["rank_vec"]) if r["rank_vec"] else 0.0
        )
        assert r["rrf"] == pytest.approx(want, abs=0)
    # doc 2 appears in BOTH lists ("spark join" text, near-probe vector)
    assert by_doc[2]["rank_lex"] is not None and by_doc[2]["rank_vec"] is not None
    # the fused winner is a both-lists doc, and it beats doc 3, which
    # tops the vector list only (the signature RRF property)
    assert out[0]["doc_id"] == 2
    assert by_doc[3]["rank_vec"] == 1 and by_doc[3]["rrf"] < by_doc[2]["rrf"]
    # a doc absent from the lexical list has NULL rank_lex, not 0
    assert by_doc[3]["rank_lex"] is None
    # output is rank-ordered by descending fused score
    assert [r["rank"] for r in out] == sorted(r["rank"] for r in out)
    assert all(out[i]["rrf"] >= out[i + 1]["rrf"] for i in range(len(out) - 1))


def test_spectral_power_finds_the_period(spark):
    import math

    from btrdb_spark.operators import spectral

    P = 1_000_000_000 * 3600  # 1h in ns
    rows = [
        ("a", t * 60_000_000_000, math.cos(2 * math.pi * (t * 60e9) / P))
        for t in range(600)  # 10 h of minutely samples
    ] + [
        ("b", t * 60_000_000_000, float((t * 2654435761) % 1000) / 1000.0 - 0.5)
        for t in range(600)  # hash noise: no 1h line
    ]
    pts = spark.createDataFrame(rows, "uuid string, time long, value double")
    out = spectral.spectral_power(pts, periods_ns=[P, P * 7]).collect()
    pw = {(r["uuid"], r["period_ns"]): r["power"] for r in out}
    # pure unit cosine at P -> power ~ (1/2)^2 = 0.25
    assert abs(pw[("a", P)] - 0.25) < 0.01
    assert pw[("a", P)] > 10 * pw[("a", P * 7)]
    assert pw[("b", P)] < 0.01 and pw[("b", P * 7)] < 0.01
    assert all(r["n"] == 600 for r in out)


def test_rendezvous_stability_under_shard_growth(spark):
    docs = spark.range(2000).select(F.col("id").alias("doc_id"))
    a = {
        r["doc_id"]: r["shard"]
        for r in pipeline.rendezvous_shard_assign(docs, n_shards=16).collect()
    }
    b = {
        r["doc_id"]: r["shard"]
        for r in pipeline.rendezvous_shard_assign(docs, n_shards=17).collect()
    }
    moved = [d for d in a if a[d] != b[d]]
    # the rendezvous invariant: adding shard 16 moves docs ONLY onto it
    assert all(b[d] == 16 for d in moved)
    # expected move fraction 1/17 ~ 5.9%; allow generous slack
    assert 0.02 < len(moved) / 2000 < 0.12
    # all 16 shards populated, assignment balanced within 2.5x of mean
    from collections import Counter

    c = Counter(a.values())
    assert len(c) == 16 and max(c.values()) < 2.5 * (2000 / 16)


def test_collocations_find_planted_bigram(spark):
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(50)]
    rows = []
    for i in range(300):
        toks = [rng.choice(vocab) for _ in range(20)]
        if i % 3 == 0:  # plant "alpha beta" as a fixed collocation
            pos = rng.randrange(0, 19)
            toks[pos:pos + 2] = ["alpha", "beta"]
        rows.append((i, " ".join(toks)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = text.collocations_topk(docs, k=10, min_count=5).collect()
    assert out[0]["bigram"] == "alpha beta"
    # alpha/beta each occur exactly 100x, always together
    assert out[0]["c_xy"] == 100 and out[0]["c_x"] == 100 and out[0]["c_y"] == 100
    # lift of a perfect collocation >> any random pair
    assert len(out) < 2 or out[0]["lift"] > 5 * out[1]["lift"]
