"""Semantic tests for round-4 operators: Gopher quality rules, vocab
stats, domain stats, counter increase, snapshot, LTTB downsampling."""

from __future__ import annotations

from pyspark.sql import functions as F

from btrdb_spark.functions import text
from btrdb_spark.operators import decimate, raw
from btrdb_spark.operators import resample as rs


def _docs(spark, texts, source="s"):
    return spark.createDataFrame(
        [(i, t, "en", source, len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def _pts(spark, rows):
    return spark.createDataFrame(
        [(u, int(t), float(v)) for (u, t, v) in rows],
        "uuid string, time long, value double",
    )


def test_gopher_passes_good_prose_fails_symbol_soup(spark):
    good = "the quick brown fox likes to be one of many animals that " * 6 + \
        "have fun with friends every day in the field and more words here now"
    bad = "### ### ### short"  # symbol-heavy, too short, no stopword pair
    out = {r["doc_id"]: r for r in text.gopher_quality(_docs(spark, [good, bad])).collect()}
    assert out[0]["passes"] is True
    assert out[0]["n_stop_hits"] >= 2
    assert out[1]["passes"] is False
    assert out[1]["symbol_word_ratio"] > 0.1


def test_gopher_bullet_and_ellipsis_rules(spark):
    bullets = "\n".join(["- item one here"] * 10)  # 100% bullet lines
    out = text.gopher_quality(_docs(spark, [bullets])).collect()[0]
    assert out["bullet_line_frac"] == 1.0 and out["passes"] is False
    trailing = "\n".join(["this line trails off into..."] * 10)
    out2 = text.gopher_quality(_docs(spark, [trailing])).collect()[0]
    assert out2["ellipsis_line_frac"] == 1.0 and out2["passes"] is False


def test_vocab_stats_exact_small_corpus(spark):
    # tokens: a a a b b c -> N=6 V=3 hapax=1 top2 mass=(3+2)/6
    out = text.vocab_stats(_docs(spark, ["a a a b", "b c"]), top_k=2).collect()[0]
    assert out["n_tokens"] == 6 and out["vocab_size"] == 3 and out["n_hapax"] == 1
    assert out["type_token_ratio"] == 3 / 6
    assert out["topk_mass"] == 5 / 6


def test_domain_stats_counts_exact_dups(spark):
    df = spark.createDataFrame(
        [
            (0, "same text", "en", "a", 9),
            (1, "same text", "en", "a", 9),
            (2, "other", "en", "a", 5),
            (3, "x", "en", "b", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {r["source"]: r for r in text.domain_stats(df).collect()}
    assert out["a"]["n_docs"] == 3 and out["a"]["n_unique"] == 2
    assert out["a"]["dup_frac"] == 1 / 3
    assert out["b"]["dup_frac"] == 0.0


def test_counter_increase_handles_resets(spark):
    # counter: 10, 25, 3 (reset), 9 -> increases 15, 3, 6; one reset
    pts = _pts(spark, [("u", i * 10, v) for i, v in enumerate([10, 25, 3, 9])])
    out = rs.counter_increase(pts, pw=10).collect()  # one bucket (width 1024)
    assert len(out) == 1
    r = out[0]
    assert r["increase"] == 15 + 3 + 6
    assert r["n_resets"] == 1 and r["n_samples"] == 3  # first sample excluded


def test_counter_increase_attributes_to_later_bucket(spark):
    # samples straddle a 2^4=16-ns bucket edge: increase lands in the
    # bucket of the LATER sample
    pts = _pts(spark, [("u", 14, 100.0), ("u", 18, 130.0)])
    out = {r["bucket_start"]: r for r in rs.counter_increase(pts, pw=4).collect()}
    assert list(out) == [16]
    assert out[16]["increase"] == 30.0


def test_snapshot_latest_per_stream_with_lookback(spark):
    pts = _pts(
        spark,
        [("a", 100, 1.0), ("a", 200, 2.0), ("b", 50, 5.0), ("c", 400, 9.0)],
    )
    out = {r["uuid"]: r for r in raw.snapshot(pts, at=300).collect()}
    assert out["a"]["time"] == 200 and out["a"]["value"] == 2.0
    assert out["b"]["value"] == 5.0
    assert "c" not in out  # after the snapshot instant
    # lookback excludes stale streams
    out2 = {r["uuid"]: r for r in raw.snapshot(pts, at=300, lookback=120).collect()}
    assert set(out2) == {"a"}


def test_lttb_picks_extreme_point_and_edge_buckets(spark):
    # stream over three 2^4-ns buckets; middle bucket has an outlier far
    # from the neighbor means -> LTTB must select it; edge buckets keep
    # their earliest point
    rows = (
        [("u", t, 0.0) for t in (0, 4, 8, 12)]          # bucket 0: flat
        + [("u", 16, 0.0), ("u", 20, 50.0), ("u", 24, 0.0)]  # bucket 1: spike
        + [("u", 32, 0.0), ("u", 36, 0.0)]               # bucket 2: flat
    )
    out = {r["bucket_start"]: r for r in decimate.lttb_downsample(_pts(spark, rows), pw=4).collect()}
    assert out[0]["time"] == 0          # edge bucket -> earliest
    assert out[16]["value"] == 50.0     # interior -> max-area spike
    assert out[32]["time"] == 32        # edge bucket -> earliest
    # one representative per bucket
    assert sorted(out) == [0, 16, 32]


def test_token_freq_quality_flags_rare_token_docs(spark):
    docs = _docs(spark, ["the cat sat", "the cat ran", "zq xv jk"])
    out = {r["doc_id"]: r for r in text.token_freq_quality(docs, min_cnt=2).collect()}
    # 'the'/'cat' appear twice; doc 2 is all hapax
    assert out[2]["rare_token_frac"] == 1.0
    assert out[0]["rare_token_frac"] == 1 / 3  # 'sat' is rare
    assert out[0]["mean_token_count"] == (2 + 2 + 1) / 3


def test_lag_correlations_finds_the_lead(spark):
    """Stream b is stream a delayed by exactly one bucket: the corr at
    lag=+1 must be 1.0 (a leads b) and beat every other lag."""
    import math

    from btrdb_spark.operators import correlate

    w = 1 << 4
    vals = [1.0, 5.0, 2.0, 8.0, 3.0, 9.0, 4.0, 7.0, 0.0, 6.0, 2.5, 8.5]
    rows = [("a", i * w + 1, v) for i, v in enumerate(vals)]
    rows += [("b", (i + 1) * w + 1, v) for i, v in enumerate(vals)]  # delayed
    out = {
        r["lag"]: r["corr"]
        for r in correlate.lag_correlations(
            _pts(spark, rows), pw=4, max_lag=2, min_overlap=4
        ).collect()
    }
    assert math.isclose(out[1], 1.0, abs_tol=1e-9)
    assert all(out[1] >= out[l] for l in out)


def test_ohlc_open_close_tie_rules(spark):
    from btrdb_spark.operators import windows as win

    # two points share the earliest time -> open is the SMALLER value;
    # two share the latest -> close is the LARGER (struct order)
    pts = _pts(spark, [("u", 0, 5.0), ("u", 0, 2.0), ("u", 9, 7.0), ("u", 9, 3.0)])
    r = win.ohlc_bars(pts, pw=4).collect()[0]
    assert (r["open"], r["high"], r["low"], r["close"], r["cnt"]) == (2.0, 7.0, 2.0, 7.0, 4)


def test_sliding_distinct_users_counts_windows(spark):
    from btrdb_spark.functions import events as ev

    rows = [(1, 100, 0.0, "view"), (2, 150, 0.0, "view"), (1, 250, 0.0, "view")]
    df = spark.createDataFrame(
        [(i, u, t, v, et) for i, (u, t, v, et) in enumerate(rows)],
        "event_id long, user_id long, time_ns long, value double, event_type string",
    )
    # width 200, hop 100, span [0, 400): windows 0,100 (200-start window
    # would end at 400 == end, allowed: start+width <= end -> 0,100,200
    out = {r["window_start"]: r for r in ev.sliding_distinct_users(
        df, width=200, hop=100, start=0, end=400
    ).collect()}
    assert out[100]["n_users"] == 2 and out[100]["n_events"] == 3
    assert out[0]["n_users"] == 2 and out[0]["n_events"] == 2
    assert out[200]["n_users"] == 1  # only the t=250 event


def test_burstiness_poisson_vs_bursty(spark):
    from btrdb_spark.operators import resample as rs2

    # uniform 1/bucket -> fano 0 (constant counts); bursty stream -> high
    uni = [("u", i * 16, 1.0) for i in range(8)]
    burst = [("b", 0 + j, 1.0) for j in range(8)] + [("b", 16 * 7, 1.0)]
    out = {r["uuid"]: r for r in rs2.burstiness(_pts(spark, uni + burst), pw=4).collect()}
    assert out["u"]["fano"] == 0.0
    assert out["b"]["fano"] > 1.0
    assert out["b"]["n_points"] == 9


def test_lang_mismatch_flags_wrong_label(spark):
    rows = [
        (0, "the quick brown fox and the lazy dog with them", "en"),
        (1, "el perro y el gato en la casa de los niños", "en"),  # mislabeled
    ]
    df = spark.createDataFrame(
        [(i, t, l, "s", len(t)) for (i, t, l) in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = text.lang_mismatch(df).collect()
    assert [r["doc_id"] for r in out] == [1]
    assert out[0]["pred_lang"] == "es" and out[0]["lang"] == "en"


def test_embedding_norm_stats_exact(spark):
    from btrdb_spark.functions import similarity as sim

    df = spark.createDataFrame(
        [(0, [3.0, 4.0], 1), (1, [6.0, 8.0], 1), (2, [0.0, 2.0], 2)],
        "vec_id long, embedding array<double>, label long",
    )
    out = {r["label"]: r for r in sim.embedding_norm_stats(df).collect()}
    assert out[1]["norm_min"] == 5.0 and out[1]["norm_max"] == 10.0
    assert out[1]["norm_mean"] == 7.5
    assert out[2]["norm_mean"] == 2.0
