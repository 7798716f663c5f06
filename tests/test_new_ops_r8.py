"""Round-8 operator semantics: KS drift, daily-count ACF, tokenizer
fertility, Gini source concentration."""

from __future__ import annotations

import pytest

from btrdb_spark.functions import analytics, text

DAY = analytics.DAY_NS


def _ev(spark, rows):
    full = [(r[0], r[1], r[2], float(r[3]), i) for i, r in enumerate(rows)]
    return spark.createDataFrame(
        full,
        "user_id long, time_ns long, event_type string, value double, "
        "event_id long",
    )


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_ks_identical_halves_is_zero(spark):
    rows = [(1, t, "a", v) for t, v in [(0, 1.0), (1, 2.0), (10, 1.0), (11, 2.0)]]
    out = analytics.ks_value_drift(_ev(spark, rows), split_ns=5).collect()
    assert len(out) == 1 and out[0]["ks_stat"] == 0.0


def test_ks_disjoint_halves_is_one(spark):
    rows = [(1, 0, "a", 1.0), (1, 1, "a", 2.0), (1, 10, "a", 9.0), (1, 11, "a", 8.0)]
    out = analytics.ks_value_drift(_ev(spark, rows), split_ns=5).collect()
    assert out[0]["ks_stat"] == 1.0
    assert out[0]["n_first"] == 2 and out[0]["n_second"] == 2


def test_ks_known_value_with_ties(spark):
    # first half: {1, 2}; second half: {2, 3}
    # supports: at 1 -> |1/2 - 0| = .5; at 2 -> |2/2 - 1/2| = .5;
    # at 3 -> 0. KS = 0.5; ties at 2 must collapse via the RANGE frame.
    rows = [(1, 0, "a", 1.0), (1, 1, "a", 2.0), (1, 10, "a", 2.0), (1, 11, "a", 3.0)]
    out = analytics.ks_value_drift(_ev(spark, rows), split_ns=5).collect()
    assert out[0]["ks_stat"] == 0.5


def test_ks_drops_single_sided_types(spark):
    rows = [(1, 0, "only_first", 1.0), (1, 10, "both", 1.0), (1, 1, "both", 2.0)]
    out = analytics.ks_value_drift(_ev(spark, rows), split_ns=5).collect()
    assert [r["event_type"] for r in out] == ["both"]


def test_acf_alternating_counts_negative_lag1(spark):
    # daily counts 1,3,1,3,1,3 -> lag-1 ACF strongly negative, lag-2
    # positive (exact rational: devs scaled by n stay integral)
    rows = []
    for d in range(6):
        c = 1 if d % 2 == 0 else 3
        for j in range(c):
            rows.append((1, d * DAY + j, "a", 0.0))
    out = {(r["event_type"], r["lag"]): r
           for r in analytics.acf_daily_counts(_ev(spark, rows), max_lag=2).collect()}
    a1, a2 = out[("a", 1)], out[("a", 2)]
    assert a1["n_days"] == 6 and a1["n_pairs"] == 5
    # devs (n=6, S=12): c=1 -> -6, c=3 -> 6; num lag1 = 5*(-36) = -180,
    # den = 6*36 = 216 -> acf = -5/6
    assert a1["acf"] == -180.0 / 216.0
    assert a2["n_pairs"] == 4 and a2["acf"] == 144.0 / 216.0


def test_acf_constant_series_dropped(spark):
    rows = [(1, d * DAY, "flat", 0.0) for d in range(5)]
    out = analytics.acf_daily_counts(_ev(spark, rows), max_lag=2).collect()
    assert out == []  # den = 0: no variance, no autocorrelation defined


def test_tokenizer_fertility_values(spark):
    docs = _docs(spark, [
        (1, "aaaa bbbb", "en", "s1", 9),      # 2 ws tokens, 9 chars -> 2 bpe
        (2, "cc dd ee", "en", "s1", 8),       # 3 ws tokens, 8 chars -> 2 bpe
        (3, "zzzzzzzz", "de", "s2", 8),       # 1 ws token, 8 chars -> 2 bpe
    ])
    out = {r["lang"]: r for r in text.tokenizer_fertility_by_lang(docs).collect()}
    en = out["en"]
    assert en["n_docs"] == 2 and en["n_tokens"] == 5 and en["n_bpe"] == 4
    assert en["fertility"] == 4.0 / 5.0
    assert en["chars_per_token"] == 17.0 / 5.0
    assert out["de"]["fertility"] == 2.0


def test_gini_uniform_is_zero_and_concentrated_is_high(spark):
    uniform = _docs(
        spark,
        [(i, "x", "en", f"s{i % 4}", 1) for i in range(40)],  # 10 docs/source
    )
    g0 = text.gini_source_concentration(uniform).collect()[0]
    assert g0["n_sources"] == 4 and g0["n_docs"] == 40
    assert g0["gini"] == 0.0
    skew = _docs(
        spark,
        [(i, "x", "en", "big" if i < 37 else f"s{i}", 1) for i in range(40)],
    )
    g1 = text.gini_source_concentration(skew).collect()[0]
    # 4 sources: counts (1,1,1,37) -> G = 2*(1+2+3+4*37)/(4*40) - 5/4
    assert g1["gini"] == 2.0 * 154.0 / 160.0 - 1.25
    assert g1["gini"] > 0.6


def test_event_transition_matrix_probabilities(spark):
    # user 1: a -> b -> a -> b ; user 2: a -> c
    rows = [
        (1, 0, "a", 0.0), (1, 1, "b", 0.0), (1, 2, "a", 0.0), (1, 3, "b", 0.0),
        (2, 0, "a", 0.0), (2, 1, "c", 0.0),
    ]
    out = {(r["from_type"], r["to_type"]): r
           for r in analytics.event_transition_matrix(_ev(spark, rows)).collect()}
    # from a: 2x a->b (user1) + 1x a->c (user2) -> P(b|a)=2/3, P(c|a)=1/3
    assert out[("a", "b")]["n"] == 2 and out[("a", "b")]["p"] == 2.0 / 3.0
    assert out[("a", "c")]["n"] == 1 and out[("a", "c")]["p"] == 1.0 / 3.0
    assert out[("b", "a")]["n"] == 1 and out[("b", "a")]["p"] == 1.0
    # no cross-user transition (user boundary respected)
    assert ("b", "c") not in out and ("c", "a") not in out
