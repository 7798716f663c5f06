"""Semantic tests for the round-3 pipeline operators: BM25 retrieval,
stratified sampling, nearest-centroid classification, MAD outliers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from btrdb_spark.functions import pipeline, similarity, text
from btrdb_spark.operators import quantiles as qt


def test_bm25_rarer_term_scores_higher(spark):
    docs = spark.createDataFrame(
        [
            (0, "common common common rare"),
            (1, "common common common common"),
            (2, "common filler filler filler"),
            (3, "filler filler filler filler"),
        ],
        "doc_id long, text string",
    )
    out = text.bm25_topk(docs, ["common", "rare"], k=4).collect()
    assert out[0]["doc_id"] == 0  # only doc with the rare term wins
    assert [r["rank"] for r in out] == [1, 2, 3]
    # doc 3 has no query terms at all -> not retrieved
    assert 3 not in {r["doc_id"] for r in out}
    assert len(out) == 3


def test_bm25_length_normalization(spark):
    # same tf: the shorter document scores higher (b > 0)
    docs = spark.createDataFrame(
        [(0, "t a"), (1, "t " + "a " * 50)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["score"] for r in text.bm25_topk(docs, ["t"], k=2).collect()}
    assert out[0] > out[1]


def test_stratified_sample_stable_and_nested(spark):
    docs = spark.createDataFrame(
        [(i, "en" if i % 3 else "de") for i in range(3000)],
        "doc_id long, lang string",
    )
    small = pipeline.stratified_sample(docs, "lang", {"en": 0.1, "de": 0.5})
    big = pipeline.stratified_sample(docs, "lang", {"en": 0.3, "de": 1.0})
    small_ids = {r["doc_id"] for r in small.collect()}
    big_ids = {r["doc_id"] for r in big.collect()}
    assert small_ids <= big_ids  # nested: same hash stream, higher cut
    # stability under growth: sampling a prefix then the full corpus
    # keeps the prefix's picks
    prefix = docs.filter(F.col("doc_id") < 1000)
    pre_ids = {
        r["doc_id"]
        for r in pipeline.stratified_sample(prefix, "lang", {"en": 0.1, "de": 0.5}).collect()
    }
    assert pre_ids == {i for i in small_ids if i < 1000}
    # fractions are roughly honored per stratum
    n_en = sum(1 for i in small_ids if i % 3)
    n_de = sum(1 for i in small_ids if not i % 3)
    assert 0.06 < n_en / 2000 < 0.14
    assert 0.4 < n_de / 1000 < 0.6


def test_centroid_classify_separable(spark):
    rows = []
    for lab, base in ((0, [10.0, 0.0, 0.0]), (1, [0.0, 10.0, 0.0]), (2, [0.0, 0.0, 10.0])):
        for j in range(20):
            rows.append((lab * 100 + j, [v + (j % 5) * 0.1 for v in base], lab))
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label long")
    out = similarity.centroid_classify(vecs).collect()
    assert all(r["true_label"] == r["pred_label"] for r in out)
    assert sum(r["n"] for r in out) == 60


def test_value_mad_outliers_hand_computed(spark):
    # values 1..9 plus one wild point: med=5 (lower median of 10), the
    # sorted |v-5| deviations are [0,1,1,2,2,3,3,4,4,95] -> mad
    # (lower median, rank 5) = 2; outliers: |v-5| > 6 -> the wild 100
    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 100.0]
    pts = spark.createDataFrame(
        [("s", i, v) for i, v in enumerate(vals)], "uuid string, time long, value double"
    )
    r = qt.value_mad_outliers(pts, k=3.0).collect()[0]
    assert (r["med"], r["mad"], r["n"], r["n_outliers"]) == (5.0, 2.0, 10, 1)
    assert r["outlier_frac"] == pytest.approx(0.1)


def test_stream_correlations_signs(spark):
    from btrdb_spark.operators.correlate import stream_correlations

    # b = 2a (corr +1), c = -a (corr -1), d = noise-free alternation
    # uncorrelated-ish with a
    rows = []
    for i in range(64):
        t = i * (1 << 20)  # one point per 2^20 bucket
        rows += [("a", t, float(i)), ("b", t, 2.0 * i), ("c", t, -float(i))]
    pts = spark.createDataFrame(rows, "uuid string, time long, value double")
    out = {
        (r["uuid_a"], r["uuid_b"]): r["corr"]
        for r in stream_correlations(pts, pw=20, min_overlap=8).collect()
    }
    assert out[("a", "b")] == pytest.approx(1.0, abs=1e-6)
    assert out[("a", "c")] == pytest.approx(-1.0, abs=1e-6)
    assert out[("b", "c")] == pytest.approx(-1.0, abs=1e-6)


def test_stream_correlations_requires_overlap(spark):
    from btrdb_spark.operators.correlate import stream_correlations

    rows = [("a", i * (1 << 20), float(i)) for i in range(20)]
    rows += [("b", (100 + i) * (1 << 20), float(i)) for i in range(20)]  # disjoint
    pts = spark.createDataFrame(rows, "uuid string, time long, value double")
    assert stream_correlations(pts, pw=20, min_overlap=4).count() == 0


def test_ewma_hand_computed(spark):
    from btrdb_spark.operators.resample import ewma

    pts = spark.createDataFrame(
        [("s", 0, 8.0), ("s", 1, 4.0), ("s", 2, 2.0)],
        "uuid string, time long, value double",
    )
    out = [r["ewma"] for r in ewma(pts, alpha=0.25).collect()]
    # e0=8, e1=0.75*8+0.25*4=7, e2=0.75*7+0.25*2=5.75 (all binary-exact)
    assert out == [8.0, 7.0, 5.75]


def test_ewma_unsorted_input_and_dup_timestamps(spark):
    from btrdb_spark.operators.resample import ewma

    # shuffled input order must not change the fold (kernel sorts); dup
    # (time, value) rows produce the same multiset of ewma values
    rows = [("s", 2, 2.0), ("s", 0, 8.0), ("s", 1, 4.0), ("s", 1, 4.0)]
    pts = spark.createDataFrame(rows, "uuid string, time long, value double")
    out = ewma(pts, alpha=0.25).collect()
    assert [r["time"] for r in out] == [0, 1, 1, 2]
    assert out[0]["ewma"] == 8.0 and out[1]["ewma"] == 7.0


def test_sdt_straight_line_collapses_to_endpoints(spark):
    from btrdb_spark.operators.compress import sdt_compress

    pts = spark.createDataFrame(
        [("s", t, 2.0 * t + 5.0) for t in range(100)],
        "uuid string, time long, value double",
    )
    out = sdt_compress(pts, tolerance=0.5).collect()
    assert [(r["time"], r["value"]) for r in out] == [(0, 5.0), (99, 203.0)]


def test_sdt_error_bound_on_random_walk(spark):
    import numpy as np
    from btrdb_spark.operators.compress import sdt_compress

    rng = np.random.RandomState(3)
    vals = np.cumsum(rng.randn(500)).tolist()
    pts = spark.createDataFrame(
        [("w", t, float(v)) for t, v in enumerate(vals)],
        "uuid string, time long, value double",
    )
    E = 1.5
    kept = [(r["time"], r["value"]) for r in sdt_compress(pts, tolerance=E).collect()]
    assert 2 < len(kept) < 500  # actually compresses
    # every dropped point within 2E of the linear reconstruction (the
    # conservative SDT bound: door feasibility gives E vs the feasible
    # line; the emitted prev-anchor segment can deviate up to one more E)
    import bisect
    kt = [t for t, _ in kept]
    for t, v in enumerate(vals):
        j = bisect.bisect_right(kt, t) - 1
        if kt[j] == t:
            continue
        (t0, v0), (t1, v1) = kept[j], kept[j + 1]
        interp = v0 + (v1 - v0) * (t - t0) / (t1 - t0)
        assert abs(interp - v) <= 2 * E + 1e-9, (t, v, interp)


def test_sdt_single_and_dup_timestamps(spark):
    from btrdb_spark.operators.compress import sdt_compress

    pts = spark.createDataFrame(
        [("a", 7, 1.0), ("b", 0, 1.0), ("b", 0, 3.0), ("b", 5, 2.0)],
        "uuid string, time long, value double",
    )
    out = {(r["uuid"], r["time"]): r["value"] for r in sdt_compress(pts, 1.0).collect()}
    assert out[("a", 7)] == 1.0                       # singleton kept
    assert out[("b", 0)] == 3.0 and out[("b", 5)] == 2.0  # max-per-ts dedup


def test_pii_scrub_cross_engine_on_synthesized_pii(spark):
    """The fixture corpus has no PII, so the driver gate only proves
    pass-through; this test runs the Spark op AND the DuckDB oracle over
    docs WITH emails/IPs/phones and asserts identical rows — the real
    cross-engine evidence for the regex subset."""
    import duckdb

    rows = [
        (0, "contact alice.smith+dev@example.co.uk or bob@x.io today"),
        (1, "server at 10.0.255.3 replied, backup 192.168.1.77 down"),
        (2, "call +1-555-0100-234 or +442079460123 for help"),
        (3, "no pii here at all just words"),
        (4, "mixed: a@b.cc from 8.8.8.8 dial +15550199222 now"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = [tuple(r) for r in __import__("btrdb_spark.functions.text", fromlist=["x"]).pii_scrub(docs).collect()]

    from btrdb_spark.functions.text import pii_scrub_oracle_sql

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = [tuple(r) for r in con.execute(pii_scrub_oracle_sql()).fetchall()]
    assert got == want
    # and the counts are what a human expects
    by_id = {r[0]: r for r in got}
    assert by_id[0][1] == 2 and by_id[1][2] == 2 and by_id[2][3] == 2
    assert by_id[3][1:4] == (0, 0, 0)
    assert by_id[4][1:4] == (1, 1, 1)


def test_gram_contrast_prefers_target_like_docs(spark):
    # seed = docs about "alpha beta"; distractor = "gamma delta"
    rows = [
        (0, "alpha beta alpha beta common filler"),
        (1, "alpha beta words common filler here"),
        # references:
        (10, "alpha beta alpha beta more text"),   # target-like
        (11, "gamma delta gamma delta more text"), # not target-like
        (12, "common filler unrelated words xyz abc"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = text.gram_contrast_topk(docs, target_max_id=10, n=2, k=3).collect()
    assert out[0]["doc_id"] == 10                       # most target-like wins
    ranks = {r["doc_id"]: r["rank"] for r in out}
    assert ranks[10] < ranks[11]
    # seed docs never appear in the output
    assert {r["doc_id"] for r in out}.isdisjoint({0, 1})


def test_gram_contrast_weight_sign(spark):
    # a gram present ONLY in the target set contributes positively;
    # one present only in references contributes negatively
    rows = [
        (0, "tkey tkey2 x"),
        (10, "tkey tkey2 y"),    # shares a target-only gram
        (11, "rkey rkey2 z"),
        (12, "rkey rkey2 w"),    # shares a reference-only gram
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["score"] for r in text.gram_contrast_topk(docs, target_max_id=10, n=2, k=10).collect()}
    assert out[10] > 0 > out[11]


def test_short_docs_produce_no_phantom_grams(spark):
    """size < n must yield ZERO grams (the descending-sequence guard):
    Spark's sequence(1, 0) is [1, 0], which without the guard fabricated
    a gram from element_at nulls."""
    from btrdb_spark.functions import dedup

    docs = spark.createDataFrame(
        [(0, "one"), (1, "two words"), (2, "three word doc")],
        "doc_id long, text string",
    )
    edges = dedup.shingle_edges(docs, n=3).collect()
    assert {r["doc_id"] for r in edges} == {2}
    assert len(edges) == 1
    # repetition signals: 1-token doc has neither bigrams nor trigrams
    out = text.repetition_scores(docs).collect()
    assert 0 not in {r["doc_id"] for r in out}
