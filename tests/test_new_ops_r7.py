"""Round-7 operator semantics: seasonal baselines, association lift,
Theil-Sen robustness, auto-bounds histograms, integer PageRank,
temperature mixture weights, n-gram novelty."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from btrdb_spark.functions import analytics, pipeline
from btrdb_spark.functions.dedup import ngram_novelty

DAY = analytics.DAY_NS
HOUR = analytics.HOUR_NS


def _ev(spark, rows):
    """(user_id, time_ns, event_type, value[, event_id]) frame."""
    full = [
        (r[0], r[1], r[2], float(r[3]), r[4] if len(r) > 4 else i)
        for i, r in enumerate(rows)
    ]
    return spark.createDataFrame(
        full, "user_id long, time_ns long, event_type string, value double, event_id long"
    )


def test_seasonal_profile_deviation(spark):
    rows = []
    # 3 baseline days at value 10.0 for hour 0, then a last day at 50.0
    for d in range(3):
        rows.append((1, d * DAY + 30, "a", 10.0))
    rows.append((1, 3 * DAY + 30, "a", 50.0))
    out = analytics.seasonal_profile_deviation(_ev(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["event_type"], r["hour"]) == ("a", 0)
    assert r["base_mean"] == 10.0 and r["last_mean"] == 50.0 and r["abs_dev"] == 40.0


def test_association_rules_lift(spark):
    # users 1..4 all do a+b (perfect association); c is independent
    rows = []
    for u in (1, 2, 3, 4):
        rows += [(u, 1, "a", 0.0), (u, 2, "b", 0.0)]
    rows += [(1, 3, "c", 0.0), (5, 1, "c", 0.0)]
    out = analytics.association_rules_topk(_ev(spark, rows), topk=10).collect()
    by_pair = {(r["type_a"], r["type_b"]): r for r in out}
    ab = by_pair[("a", "b")]
    # N=5 users, c_ab=4, c_a=c_b=4 -> lift = 5*4/(4*4) = 1.25
    assert ab["c_ab"] == 4 and ab["lift"] == 1.25
    ac = by_pair[("a", "c")]
    # c_ac=1, c_a=4, c_c=2 -> lift = 5/(8) = 0.625
    assert ac["lift"] == 0.625
    assert out[0]["lift"] == max(r["lift"] for r in out)


def test_theil_sen_resists_outlier_day(spark):
    # days 0..6 with mean = 2*day, except day 3 is a wild outlier
    rows = []
    for d in range(7):
        v = 1000.0 if d == 3 else 2.0 * d
        rows.append((1, d * DAY + 5, "a", v))
    out = analytics.theil_sen_daily_slope(_ev(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_days"] == 7 and r["n_pairs"] == 21
    # median pairwise slope stays the clean trend despite the outlier
    assert r["slope_per_day"] == 2.0


def test_value_histogram_auto_bounds(spark):
    rows = [(1, i, "a", float(v)) for i, v in enumerate([0, 5, 10, 10, 10])]
    out = analytics.value_histogram(_ev(spark, rows), n_bins=10).collect()
    got = {r["bin"]: r["n"] for r in out}
    # lo=0 hi=10: 0->bin0, 5->bin5, 10 (== hi) clamps into bin 9
    assert got == {0: 1, 5: 1, 9: 3}
    lo9 = [r for r in out if r["bin"] == 9][0]["bin_lo"]
    assert lo9 == 9.0


def test_pagerank_event_graph_orders_hubs(spark):
    # every user: a -> b, b -> c, c -> b ... b is the hub
    rows = []
    for u in range(20):
        rows += [
            (u, 1, "a", 0.0),
            (u, 2, "b", 0.0),
            (u, 3, "c", 0.0),
            (u, 4, "b", 0.0),
        ]
    out = analytics.pagerank_event_graph(_ev(spark, rows)).collect()
    ranks = {r["event_type"]: r["rank"] for r in out}
    assert ranks["b"] > ranks["c"] > ranks["a"]
    # integer determinism: a second run is bit-identical
    again = analytics.pagerank_event_graph(_ev(spark, rows)).collect()
    assert [(r["event_type"], r["rank"]) for r in out] == [
        (r["event_type"], r["rank"]) for r in again
    ]


def test_mixture_temperature_upweights_small_sources(spark):
    docs = spark.createDataFrame(
        [(i, "w " * (100 if i < 90 else 1) + "w", "big" if i < 90 else "small")
         for i in range(100)],
        "doc_id long, text string, source string",
    )
    out = {r["source"]: r for r in
           pipeline.mixture_temperature_weights(docs).collect()}
    assert out["small"]["boost"] > 1.0 > out["big"]["boost"]
    # shares still sum to ~1 each way
    for col in ("share_proportional", "share_temperature"):
        assert abs(sum(r[col] for r in out.values()) - 1.0) < 1e-9
    # alpha=1/2: temperature share ratio tracks sqrt of token ratio
    t_ratio = out["big"]["share_temperature"] / out["small"]["share_temperature"]
    n_ratio = out["big"]["n_tokens"] / out["small"]["n_tokens"]
    assert abs(t_ratio - math.sqrt(n_ratio)) / t_ratio < 1e-4


def test_ngram_novelty_flags_recycled_text(spark):
    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon"),
            (1, "alpha beta gamma delta epsilon"),  # pure recycle -> 0.0
            (2, "zeta eta theta iota kappa"),  # all fresh -> 1.0
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in ngram_novelty(docs, n=3).collect()}
    assert out[0]["novelty"] == 1.0  # first occurrence wins
    assert out[1]["novelty"] == 0.0
    assert out[2]["novelty"] == 1.0
    assert out[0]["n_grams"] == 3  # 5 tokens -> 3 trigrams


def test_session_window_stats_boundaries(spark):
    G = 1_800_000_000_000  # 30 min
    rows = [
        (1, 0, "a", 1.0),
        (1, G, "a", 2.0),        # exactly the gap -> SAME session
        (1, 2 * G + 1_000, "b", 3.0),  # past the gap -> new session
        (2, 5, "a", 4.0),
    ]
    out = analytics.session_window_stats(_ev(spark, rows), gap_ns=G).collect()
    per_user = {}
    for r in out:
        per_user.setdefault(r["user_id"], []).append(r)
    assert len(per_user[1]) == 2 and len(per_user[2]) == 1
    s1, s2 = per_user[1]
    assert s1["n_events"] == 2 and s1["session_start_ns"] == 0
    assert s1["mean_value"] == 1.5 and s1["n_types"] == 1
    assert s2["n_events"] == 1 and s2["n_types"] == 1


def test_knn_label_consistency_clustered(spark):
    from btrdb_spark.functions import similarity

    # two tight clusters in 2-d: label 0 near (1,0), label 1 near (0,1)
    rows = []
    for i in range(10):
        rows.append((i, [1.0, 0.01 * i], 0))
        rows.append((100 + i, [0.01 * i, 1.0], 1))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = similarity.knn_label_consistency(emb, emb, k=3).collect()
    accs = {r["label"]: r for r in out}
    assert accs[0]["accuracy"] == 1.0 and accs[1]["accuracy"] == 1.0
    assert accs[0]["n_probes"] == 10 and accs[1]["n_probes"] == 10


def test_phash64_reference_and_invariance():
    import numpy as np

    from btrdb_spark.functions import multimodal as mm

    # independent reference: float DCT, same luma/resize/median contract
    def ref(pixels):
        import math

        px = pixels.astype(np.int64)
        luma = (77 * px[:, :, 0] + 150 * px[:, :, 1] + 29 * px[:, :, 2]) >> 8
        h, w = luma.shape
        g = luma[(np.arange(32) * h) // 32][:, (np.arange(32) * w) // 32]
        C = np.array(
            [[math.cos(math.pi * (2 * j + 1) * k / 64) for j in range(32)]
             for k in range(32)]
        )
        block = (C @ g @ C.T)[:8, :8].ravel()
        med = np.sort(block)[31]
        out = 0
        for b in block > med:
            out = (out << 1) | int(b)
        return out - (1 << 64) if out >= (1 << 63) else out

    rng_px = lambda seed, h, w: (
        ((seed * 2654435761 + np.arange(h * w * 3, dtype=np.int64) * 40503)
         ^ (np.arange(h * w * 3, dtype=np.int64) ** 2)) % 256
    ).astype(np.uint8).reshape(h, w, 3)
    for seed in (1, 42, 777):
        px = rng_px(seed, 9, 11)
        got, want = mm.phash64(px), ref(px)
        # fixed-point vs float DCT: identical bits except where a coef ties
        # the median; require Hamming <= 2 of 64
        assert bin((got ^ want) & ((1 << 64) - 1)).count("1") <= 2
        # exact invariance: same pixels -> same hash, always
        assert mm.phash64(px.copy()) == got
        # one-byte edit stays perceptually identical
        px2 = px.copy()
        px2[0, 0, 0] = (int(px2[0, 0, 0]) + 1) % 256
        assert bin((mm.phash64(px2) ^ got) & ((1 << 64) - 1)).count("1") <= 2


def test_phash_pairs_finds_planted_neardups(spark):
    from pyspark.sql import functions as F

    from btrdb_spark.functions import multimodal as mm

    docs = spark.range(200).select(F.col("id").alias("doc_id"))
    media = mm.synthetic_ppm_neardups(docs)
    pairs = {
        (r["media_id"], r["media_id2"]): r["hamming"]
        for r in mm.phash_pairs(media, max_hamming=7).collect()
    }
    planted = [(i - 1, i) for i in range(200) if i % 20 == 7]
    assert planted, "fixture must plant pairs"
    for p in planted:
        assert p in pairs and pairs[p] <= 2, f"planted pair {p} missed"
    # exact byte-hash dedup must MISS every planted pair (one byte differs)
    from btrdb_spark.functions import dedup as dd

    blobs = media.select(
        F.col("media_id").alias("doc_id"), F.base64("blob").alias("text")
    )
    exact = {
        r["keeper_doc_id"]
        for r in dd.exact_duplicates(blobs).filter(F.col("n_copies") > 1).collect()
    }
    assert not exact, "planted near-dups must not be byte-exact"


def test_wav_rms_windows_codec_roundtrip(spark):
    from pyspark.sql import functions as F

    from btrdb_spark.functions import multimodal as mm

    docs = spark.range(12).select(F.col("id").alias("doc_id"))
    media = mm.synthetic_wav_media(docs)
    out = mm.wav_rms_windows(media, window_frames=50).collect()
    # doc 0: n = 200 frames -> 4 windows of exactly 50
    w0 = [r for r in out if r["media_id"] == 0]
    assert [r["n_frames"] for r in w0] == [50, 50, 50, 50]
    # closed-form check of window 0 of doc 3 (n = 320): s_i = (21+13i)%65536-32768
    import math

    s = [((3 * 7 + i * 13) % 65536) - 32768 for i in range(50)]
    ss = sum(x * x for x in s)
    r30 = [r for r in out if r["media_id"] == 3 and r["win"] == 0][0]
    assert r30["sum_sq"] == ss
    assert r30["rms"] == math.sqrt(ss / 50)
    # ragged tail: doc 1 has n = 240 -> last window 40 frames
    w1 = [r for r in out if r["media_id"] == 1]
    assert [r["n_frames"] for r in w1] == [50, 50, 50, 50, 40]
