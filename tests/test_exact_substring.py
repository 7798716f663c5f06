"""Semantic tests for exact duplicated-substring coverage (dedup.py)."""

from __future__ import annotations

from btrdb_spark.functions import dedup


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_cross_doc_shared_gram_marks_both(spark):
    shared = "a b c d"  # k=4 gram shared verbatim
    docs = _docs(spark, [f"x y {shared} z", f"p {shared} q r"])
    out = {r["doc_id"]: r for r in dedup.exact_substring_spans(docs, k=4).collect()}
    # exactly the 4 shared tokens are covered in each doc
    assert out[0]["dup_tokens"] == 4 and out[1]["dup_tokens"] == 4
    assert abs(out[0]["dup_frac"] - 4 / 7) < 1e-12


def test_unique_docs_have_zero_coverage(spark):
    docs = _docs(spark, ["a b c d e", "f g h i j"])
    out = dedup.exact_substring_spans(docs, k=3).collect()
    assert all(r["dup_tokens"] == 0 and r["dup_frac"] == 0.0 for r in out)


def test_within_doc_repeat_counts(spark):
    # "a b c" occurs twice inside one doc -> positions of both occurrences covered
    docs = _docs(spark, ["a b c x a b c", "u v w y z q s"])
    out = {r["doc_id"]: r for r in dedup.exact_substring_spans(docs, k=3).collect()}
    assert out[0]["dup_tokens"] == 6  # all but the middle 'x'
    assert out[1]["dup_tokens"] == 0


def test_doc_shorter_than_k_yields_no_grams(spark):
    docs = _docs(spark, ["a b", "a b"])
    out = dedup.exact_substring_spans(docs, k=3).collect()
    assert {r["n_tokens"] for r in out} == {2}
    assert all(r["dup_tokens"] == 0 for r in out)


def test_overlapping_dup_spans_union_not_sum(spark):
    # doc0 and doc1 share the 5-token run "a b c d e"; with k=4 the two
    # overlapping grams cover the union {1..5}, not 8 tokens
    docs = _docs(spark, ["a b c d e", "z a b c d e w"])
    out = {r["doc_id"]: r for r in dedup.exact_substring_spans(docs, k=4).collect()}
    assert out[0]["dup_tokens"] == 5
    assert out[1]["dup_tokens"] == 5


def test_containment_detects_subset_doc(spark):
    """A short doc fully contained in a long one: containment(A in B)=1
    while Jaccard is low — the signal this operator exists for."""
    quote = "the quick brown fox jumps over dogs"
    long = "intro words here " + quote + " plus a long tail of many extra tokens x y z w"
    docs = _docs(spark, [quote, long, "completely unrelated content words here now"])
    out = dedup.ngram_containment_pairs(docs, n=3, threshold=0.9).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["doc_a"], r["doc_b"]) == (0, 1)
    assert r["cont_a_in_b"] == 1.0      # every 3-gram of the quote is in the long doc
    assert r["cont_b_in_a"] < 0.5       # but not vice versa
    # Jaccard would be inter/(na+nb-inter) = well under the threshold
    assert r["inter"] / (r["na"] + r["nb"] - r["inter"]) < 0.5


def test_containment_max_df_drops_boilerplate_shingle(spark):
    """A boilerplate shingle shared by EVERY doc (the unbounded-quadratic
    case) is dropped from the universe when max_df caps it, both from
    intersections and from per-doc sizes — so unrelated docs that share
    only the boilerplate produce no pair at all."""
    boiler = "copyright two thousand"  # one 3-gram shared by all docs
    quote = "the quick brown fox jumps over dogs"
    texts = [
        quote + " " + boiler,
        "intro words here " + quote + " " + boiler + " plus tail tokens x y z",
        "first unrelated content entirely here " + boiler,
        "second unrelated body of text now " + boiler,
        "third unrelated run of words again " + boiler,
    ]
    docs = _docs(spark, texts)
    # uncapped: the boilerplate gram links every doc pair -> many candidates
    # reach the pair groupBy (visible as inter>=1 pairs at threshold 0)
    uncapped = dedup.ngram_containment_pairs(docs, n=3, threshold=0.0).collect()
    assert len(uncapped) == 10  # all C(5,2) pairs share >= the boiler gram
    # capped at max_df=2: the df=5 boiler grams leave the universe; only
    # the genuine quote-subset pair (0 in 1) survives a 0.9 threshold
    capped = dedup.ngram_containment_pairs(docs, n=3, threshold=0.9, max_df=2)
    rows = capped.collect()
    assert [(r["doc_a"], r["doc_b"]) for r in rows] == [(0, 1)]
    r = rows[0]
    assert r["cont_a_in_b"] == 1.0
    # and even at threshold 0 the unrelated-only pairs are gone entirely
    capped0 = dedup.ngram_containment_pairs(docs, n=3, threshold=0.0, max_df=2).collect()
    pairs0 = {(r["doc_a"], r["doc_b"]) for r in capped0}
    assert (2, 3) not in pairs0 and (3, 4) not in pairs0 and (2, 4) not in pairs0


def test_strip_spans_removes_shared_run_keeps_rest(spark):
    shared = "a b c d"  # k=4 gram repeated across docs
    docs = _docs(spark, [f"x y {shared} z", f"p {shared} q r"])
    out = {r["doc_id"]: r for r in dedup.strip_duplicate_spans(docs, k=4).collect()}
    assert out[0]["clean_text"] == "x y z"
    assert out[1]["clean_text"] == "p q r"
    assert out[0]["kept_tokens"] == 3 and out[0]["n_tokens"] == 7


def test_strip_spans_untouched_doc_roundtrips(spark):
    docs = _docs(spark, ["a b c d e", "f g h i j"])
    out = {r["doc_id"]: r for r in dedup.strip_duplicate_spans(docs, k=3).collect()}
    assert out[0]["clean_text"] == "a b c d e"
    assert out[1]["clean_text"] == "f g h i j"


def test_strip_spans_fully_duplicated_doc_empties(spark):
    docs = _docs(spark, ["a b c", "a b c"])
    out = dedup.strip_duplicate_spans(docs, k=3).collect()
    assert all(r["clean_text"] == "" and r["kept_tokens"] == 0 for r in out)
