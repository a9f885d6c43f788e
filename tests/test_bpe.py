"""BPE training: exact merge-table parity with a pure-python BPE twin
(Sennrich-style learn loop) plus segmentation properties."""

from __future__ import annotations

import collections
import re

import pytest

from montecarlopagerank_spark.pipeline.bpe import (
    bpe_segment_counts,
    bpe_train,
    word_types,
)


def _py_bpe(texts, n_merges):
    freq = collections.Counter(
        t for txt in texts for t in re.findall(r"[a-z0-9]+", txt.lower())
    )
    vocab = {w: list(w) for w in freq}
    merges = []
    for _ in range(n_merges):
        cnt = collections.Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                cnt[(syms[i], syms[i + 1])] += freq[w]
        if not cnt:
            break
        (l, r), c = min(
            cnt.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((l, r, c))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):  # greedy left-to-right, non-overlapping
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


TEXTS = [
    "the cat sat on the mat",
    "the cats eat the oats",
    "a banana bandana in havana",
    "lower lowest newer newest wider widest",
    "aaa abab the the the",
]


def _docs(spark, texts=TEXTS):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_bpe_merges_match_python_twin(spark):
    merges, vocab = bpe_train(spark, _docs(spark), n_merges=10)
    want_merges, want_vocab = _py_bpe(TEXTS, 10)
    assert merges == want_merges
    got = {r["w"]: r["s"] for r in vocab.collect()}
    for w, syms in want_vocab.items():
        assert got[w] == " " + "  ".join(syms) + " ", w


def test_bpe_segment_counts(spark):
    merges, vocab = bpe_train(spark, _docs(spark), n_merges=10)
    _, want_vocab = _py_bpe(TEXTS, 10)
    got = {r["w"]: (r["freq"], r["n_tokens"])
           for r in bpe_segment_counts(vocab).collect()}
    freq = collections.Counter(
        t for txt in TEXTS for t in re.findall(r"[a-z0-9]+", txt.lower())
    )
    for w, syms in want_vocab.items():
        assert got[w] == (freq[w], len(syms))


def test_bpe_overlap_semantics(spark):
    """[a,a,a] counts (a,a) twice but merges to [aa, a] — the greedy
    non-overlapping pass both engines implement via literal replace."""
    merges, vocab = bpe_train(
        spark, _docs(spark, ["aaa aaa bb"]), n_merges=1
    )
    assert merges[0][:2] == ("a", "a")
    got = {r["w"]: r["s"] for r in vocab.collect()}
    assert got["aaa"] == " aa  a "
    assert got["bb"] == " b  b "


def test_bpe_exhausts_and_stops_early(spark):
    merges, vocab = bpe_train(spark, _docs(spark, ["ab ab"]), n_merges=50)
    assert [m[:2] for m in merges] == [("a", "b")]  # then no pairs remain
    assert {r["s"] for r in vocab.collect()} == {" ab "}
