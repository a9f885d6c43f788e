"""Tests: cross-document duplicated n-gram spans (pipeline/dupspans.py)
— the distributed stand-in for suffix-array exact-substring dedup."""

from __future__ import annotations

import pytest

from montecarlopagerank_spark.pipeline.dupspans import dup_ngram_spans

SPAN = "the quick brown fox jumps over the lazy dog"  # 9 words


def docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def by_id(df):
    return {r["doc_id"]: r for r in df.collect()}


def test_shared_span_recovers_run_length(spark):
    # docs 0 and 1 share a 9-word span; with n=3 that is 9-3+1 = 7
    # consecutive duplicated positions in each
    docs = docs_df(
        spark,
        [
            f"alpha beta {SPAN} gamma delta",
            f"one two three {SPAN} four",
            "completely different words everywhere in this document",
        ],
    )
    got = by_id(dup_ngram_spans(docs, n=3, min_docs=2))
    # doc 0: 13 words -> 11 grams; the span occupies positions 2..8
    assert got[0]["n_grams"] == 11
    assert got[0]["n_dup_grams"] == 7
    assert got[0]["max_dup_run"] == 7
    assert got[0]["dup_ratio"] == pytest.approx(7 / 11)
    # longest shared token span = run + n - 1 = 9 tokens, the seed span
    assert got[0]["max_dup_run"] + 3 - 1 == 9
    assert got[1]["n_dup_grams"] == 7 and got[1]["max_dup_run"] == 7
    assert got[2]["n_dup_grams"] == 0 and got[2]["max_dup_run"] == 0


def test_within_doc_repetition_not_flagged(spark):
    # the gram repeats INSIDE doc 0 but exists nowhere else: document
    # frequency 1 -> cross-doc dedup must not flag it
    docs = docs_df(
        spark,
        [
            "echo echo echo echo echo echo",
            "a totally unrelated second document",
        ],
    )
    got = by_id(dup_ngram_spans(docs, n=3, min_docs=2))
    assert got[0]["n_grams"] == 4
    assert got[0]["n_dup_grams"] == 0 and got[0]["max_dup_run"] == 0


def test_short_docs_and_min_docs_threshold(spark):
    docs = docs_df(
        spark,
        ["tiny", "shared phrase here now", "shared phrase here also", ""],
    )
    got = by_id(dup_ngram_spans(docs, n=4, min_docs=2))
    # docs 0 and 3: fewer than n words -> zero grams, ratio 0.0
    for d in (0, 3):
        assert got[d]["n_grams"] == 0
        assert got[d]["dup_ratio"] == 0.0
        assert got[d]["max_dup_run"] == 0
    # 4-grams of docs 1 and 2 differ in the last word -> no duplication
    assert got[1]["n_dup_grams"] == 0
    # at n=3 the leading 3-gram "shared phrase here" is in both
    got3 = by_id(dup_ngram_spans(docs, n=3, min_docs=2))
    assert got3[1]["n_dup_grams"] == 1 and got3[1]["max_dup_run"] == 1
    # raising min_docs above the document frequency unflags it
    got_hi = by_id(dup_ngram_spans(docs, n=3, min_docs=3))
    assert got_hi[1]["n_dup_grams"] == 0


def test_disjoint_runs_pick_longest(spark):
    # two shared regions separated by unique words: runs of 2 and 1
    # (n=2): "red green blue" shared (2 grams) + "final pair" (1 gram)
    docs = docs_df(
        spark,
        [
            "red green blue unique1 unique2 final pair",
            "red green blue other1 other2 other3 final pair",
        ],
    )
    got = by_id(dup_ngram_spans(docs, n=2, min_docs=2))
    assert got[0]["n_dup_grams"] == 3
    assert got[0]["max_dup_run"] == 2
