"""TF-IDF / BM25 retrieval: formula pinned against a pure-python
oracle, determinism of tie-breaks, tokenizer edge cases."""

from __future__ import annotations

import math
import re

from montecarlopagerank_spark.pipeline.tfidf import (
    TOKEN_RE,
    bm25_search,
    doc_terms,
    tf_idf_top_terms,
)

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat"),
    (2, "cat cat cat dog"),
    (3, "Punctuation, DOES-not;matter 42"),
    (4, "mat mat"),
]


def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def py_tokens(text):
    return [t for t in re.split(TOKEN_RE, text.lower()) if t]


def test_doc_terms_matches_python(spark):
    out = doc_terms(docs_df(spark)).collect()
    got = {(r.doc_id, r.term): r.tf for r in out}
    want = {}
    for did, text in DOCS:
        for t in py_tokens(text):
            want[(did, t)] = want.get((did, t), 0) + 1
    assert got == want


def test_tfidf_formula_and_ranking(spark):
    out = tf_idf_top_terms(docs_df(spark), k=2).collect()
    # python oracle: smooth idf, round 6, ties by term asc
    tfs, dfs = {}, {}
    for did, text in DOCS:
        seen = set()
        for t in py_tokens(text):
            tfs[(did, t)] = tfs.get((did, t), 0) + 1
            if t not in seen:
                seen.add(t)
                dfs[t] = dfs.get(t, 0) + 1
    n = len(DOCS)
    want = {}
    for did, _ in DOCS:
        scored = sorted(
            (
                (-round(tf * (math.log((1 + n) / (1 + dfs[t])) + 1), 6), t)
                for (d, t), tf in tfs.items()
                if d == did
            ),
        )[:2]
        want[did] = [(i + 1, t, -s) for i, (s, t) in enumerate(scored)]
    got = {}
    for r in out:
        got.setdefault(r.doc_id, []).append((r.rank, r.term, r.tfidf_r6))
    got = {k: sorted(v) for k, v in got.items()}
    assert got == want


def bm25_py(docs, query_terms, k1=1.2, b=0.75):
    toks = {did: py_tokens(text) for did, text in docs}
    n = len(docs)
    dls = {did: len(t) for did, t in toks.items()}
    avgdl = sum(dls.values()) / n
    dfs = {
        q: sum(1 for t in toks.values() if q in t) for q in query_terms
    }
    scores = {}
    for did, t in toks.items():
        s = 0.0
        for q in query_terms:
            tf = t.count(q)
            if tf == 0 or dfs[q] == 0:
                continue
            idf = math.log(1 + (n - dfs[q] + 0.5) / (dfs[q] + 0.5))
            s += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dls[did] / avgdl))
        if s > 0:
            scores[did] = round(s, 6)
    return scores


def test_bm25_scores_match_python(spark):
    out = bm25_search(docs_df(spark), "cat mat", k=10).collect()
    got = {r.doc_id: r.score_r6 for r in out}
    want = bm25_py(DOCS, ["cat", "mat"])
    assert set(got) == set(want)
    for d in want:
        assert abs(got[d] - want[d]) < 2e-6, (d, got[d], want[d])
    # ranking: rank 1 must be the max score, ties by doc_id asc
    ranked = sorted(out, key=lambda r: r.rank)
    resorted = sorted(out, key=lambda r: (-r.score_r6, r.doc_id))
    assert [r.doc_id for r in ranked] == [r.doc_id for r in resorted]


def test_bm25_topk_limit_and_empty_query(spark):
    out = bm25_search(docs_df(spark), "cat mat the", k=2).collect()
    assert len(out) == 2
    import pytest

    with pytest.raises(ValueError):
        bm25_search(docs_df(spark), "...,;")


def hashed_naive(texts, n_features, ngram):
    import hashlib
    import re

    out: dict = {}
    for i, t in enumerate(texts):
        toks = re.sub(r"\s+", " ", t.strip().lower()).split(" ")
        grams = [
            " ".join(toks[j : j + ngram]) for j in range(len(toks) - ngram + 1)
        ] if len(toks) >= ngram else []
        for g in grams:
            if not g:
                continue
            idx = int(hashlib.md5(f"fh:{g}".encode()).hexdigest()[:8], 16) % n_features
            s = 1 if int(hashlib.md5(f"fs:{g}".encode()).hexdigest()[0], 16) % 2 == 0 else -1
            out[(i, idx)] = out.get((i, idx), 0) + s
    return {k: v for k, v in out.items() if v != 0}


def test_hashed_features_matches_python_twin(spark):
    from montecarlopagerank_spark.pipeline.tfidf import hashed_features

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs",
        "the quick brown fox",          # shares grams with doc 0
        "single",                        # no bigram
        "",                              # empty
        "  spaced    out   tokens  ",    # normalization collapses runs
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r.doc_id, r.idx): r.val
        for r in hashed_features(df, n_features=64, ngram=2).collect()
    }
    assert got == hashed_naive(texts, 64, 2)
    # shared grams hash identically across documents
    shared = {(i, x) for (i, x) in got if i in (0, 2)}
    idx0 = {x for (i, x) in shared if i == 0}
    idx2 = {x for (i, x) in shared if i == 2}
    assert idx2 <= idx0


def test_hashed_features_validates_args(spark):
    import pytest as _pytest

    from montecarlopagerank_spark.pipeline.tfidf import hashed_features

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        hashed_features(df, n_features=0)
