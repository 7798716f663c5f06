"""Chunking, repetition, and event-analytics operators on tiny fixtures."""

from __future__ import annotations

import pytest

from btrdb_spark.functions import chunking, text
from btrdb_spark.functions import events as events_fn
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "a b c d e f g h i j"),            # 10 tokens
        (2, "a b c d e f g h i j"),            # exact dup of 1 -> shared chunks
        (3, "x y z"),                           # shorter than one chunk
        (4, "p p p p q q p p p p"),             # heavy repetition
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_doc_chunk_offsets_and_tails(docs):
    out = chunking.doc_chunk(docs, chunk_tokens=4, stride=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    c1 = by_doc[1]
    # starts 0,3,6,9 -> 4 chunks; final chunk is the single trailing token
    assert [r["start_token"] for r in c1] == [0, 3, 6, 9]
    assert [r["chunk_ix"] for r in c1] == [0, 1, 2, 3]
    assert c1[0]["chunk_text"] == "a b c d"
    assert c1[-1]["chunk_text"] == "j" and c1[-1]["n_chunk_tokens"] == 1
    # a 3-token doc yields exactly one (short) chunk
    assert len(by_doc[3]) == 1 and by_doc[3][0]["n_chunk_tokens"] == 3


def test_chunk_dedup_stats_marks_cross_doc_chunks(docs):
    out = {r["doc_id"]: r for r in chunking.chunk_dedup_stats(docs, 4, 3).collect()}
    # docs 1 and 2 are identical: every chunk shared
    assert out[1]["shared_frac"] == 1.0 and out[2]["shared_frac"] == 1.0
    # docs 3 and 4 share nothing with anyone
    assert out[3]["n_shared_chunks"] == 0 and out[4]["n_shared_chunks"] == 0


def test_repetition_scores(docs):
    out = {r["doc_id"]: r for r in text.repetition_scores(docs).collect()}
    # doc 1: all 9 bigrams distinct -> top fraction 1/9, no dup trigram
    assert out[1]["top_bigram_frac"] == pytest.approx(1 / 9)
    assert out[1]["dup_trigram_frac"] == 0.0
    # doc 4 "p p p p q q p p p p": "p p" appears 6 times of 9 bigrams
    assert out[4]["top_bigram_frac"] == pytest.approx(6 / 9)
    # trigrams: "p p p" x4 of 8 -> dup fraction 4/8
    assert out[4]["dup_trigram_frac"] == pytest.approx(4 / 8)


@pytest.fixture(scope="module")
def events_ns(spark):
    # user 1 converts fully; user 2 clicks before any view (non-causal ->
    # no click counted); user 3 views only
    rows = [
        (1, 100, "view", '{"k": 5}'),
        (1, 200, "click", '{"k": 6}'),
        (1, 300, "purchase", '{"k": 7}'),
        (2, 100, "click", '{"k": 1}'),
        (2, 200, "view", '{"k": 2}'),
        (3, 50, "view", '{"k": 3}'),
    ]
    return spark.createDataFrame(
        rows, "user_id long, time_ns long, event_type string, props string"
    )


def test_event_funnel_causality(events_ns):
    out = {r["uuid"]: r for r in events_fn.event_funnel(events_ns).collect()}
    assert (out["1"]["first_view"], out["1"]["first_click"], out["1"]["first_purchase"]) == (
        100, 200, 300,
    )
    # user 2's click precedes their first view -> stage not reached
    assert out["2"]["first_view"] == 200 and out["2"]["first_click"] is None
    assert out["3"]["first_click"] is None and out["3"]["first_purchase"] is None


def test_props_extract_stats(events_ns):
    out = {r["event_type"]: r for r in events_fn.props_extract_stats(events_ns).collect()}
    assert out["view"]["n_events"] == 3 and out["view"]["sum_k"] == 10
    assert out["click"]["min_k"] == 1 and out["click"]["max_k"] == 6
    assert out["purchase"]["avg_k"] == 7.0


def test_funnel_single_exchange(events_ns):
    """The three stacked windows must reuse ONE shuffle on user_id."""
    plan = events_fn.event_funnel(events_ns)._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning")
    # one exchange for the window partitioning; the final groupBy reuses it
    # (plus possibly one for the output orderBy's range partitioning)
    assert n_exchanges <= 2, plan
