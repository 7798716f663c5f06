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
