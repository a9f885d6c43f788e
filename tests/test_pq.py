"""Product quantization: exact parity with a pure-numpy PQ twin
(hash-order init, Lloyd, encode, ADC) + a recall floor vs exact L2."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from montecarlopagerank_spark.pipeline.pq import (
    pq_adc_topk,
    pq_encode,
    pq_train,
)


def _emb_df(spark, X):
    return spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(X)],
        "vec_id long, embedding array<float>",
    )


def _np_pq(X, m, k, iters):
    """Numpy twin of pq_train/pq_encode: returns (codebook[m][k][sub],
    codes[n][m]). Mirrors the engine exactly: float32-widened input,
    md5-order seeding, argmin over (round(d2, 6), cid), empty cells
    keep their codeword."""
    X = X.astype(np.float32).astype(np.float64)
    n, dim = X.shape
    sub = dim // m
    order = sorted(range(n), key=lambda v: (hashlib.md5(str(v).encode()).hexdigest(), v))
    books = np.stack(
        [X[order[:k], mm * sub:(mm + 1) * sub] for mm in range(m)]
    )  # (m, k, sub)

    def enc(books):
        codes = np.zeros((n, m), dtype=np.int64)
        for mm in range(m):
            S = X[:, mm * sub:(mm + 1) * sub]
            d2 = ((S[:, None, :] - books[mm][None, :, :]) ** 2).sum(axis=2)
            codes[:, mm] = np.round(d2, 6).argmin(axis=1)  # ties -> low cid
        return codes

    for _ in range(iters):
        codes = enc(books)
        for mm in range(m):
            S = X[:, mm * sub:(mm + 1) * sub]
            for c in range(k):
                sel = S[codes[:, mm] == c]
                if len(sel):
                    books[mm][c] = sel.mean(axis=0)
    return books, enc(books)


def test_pq_codes_match_numpy_twin(spark):
    rng = np.random.RandomState(11)
    X = rng.randn(60, 8).astype(np.float32)
    emb = _emb_df(spark, X)
    book = pq_train(spark, emb, m=2, k=4, iters=2)
    codes = pq_encode(emb, book, m=2)
    got_book = {
        (r["m"], r["cid"]): np.array(r["cvec"]) for r in book.collect()
    }
    got_codes = {r["vid"]: list(r["codes"]) for r in codes.collect()}
    books, want_codes = _np_pq(X, m=2, k=4, iters=2)
    for (mm, cid), cv in got_book.items():
        assert np.allclose(cv, books[mm][cid], atol=1e-9), (mm, cid)
    assert got_codes == {
        i: list(map(int, want_codes[i])) for i in range(len(X))
    }


def test_pq_adc_matches_numpy_and_ranks(spark):
    rng = np.random.RandomState(12)
    X = rng.randn(50, 8).astype(np.float32)
    emb = _emb_df(spark, X)
    book = pq_train(spark, emb, m=2, k=4, iters=2)
    codes = pq_encode(emb, book, m=2)
    q = _emb_df(spark, X[:3])
    got = pq_adc_topk(spark, codes, book, q, m=2, k=5)
    rows = sorted(
        (r["query_id"], r["rank"], r["match_id"], r["adc_r6"])
        for r in got.collect()
    )
    books, cds = _np_pq(X, m=2, k=4, iters=2)
    Xd = X.astype(np.float64)
    sub = 4
    for qid in range(3):
        d = np.zeros(len(X))
        for mm in range(2):
            qs = Xd[qid, mm * sub:(mm + 1) * sub]
            t = ((qs[None, :] - books[mm]) ** 2).sum(axis=1)  # (k,)
            d += t[cds[:, mm]]
        d_r = np.round(d, 6)
        cand = [(d_r[i], i) for i in range(len(X)) if i != qid]
        want = sorted(cand)[:5]
        mine = [(r[3], r[2]) for r in rows if r[0] == qid]
        assert mine == [(pytest.approx(dv, abs=2e-6), i) for dv, i in want]


def test_pq_recall_floor_vs_exact_l2(spark):
    """Clustered data: ADC top-10 must recover >= 50% of the true L2
    top-10 on average (PQ is lossy; the floor pins 'works', a regression
    to hash-garbage scores ~10%)."""
    rng = np.random.RandomState(13)
    centers = rng.randn(8, 16) * 5.0
    X = np.vstack(
        [centers[i % 8] + rng.randn(16) * 0.8 for i in range(240)]
    ).astype(np.float32)
    emb = _emb_df(spark, X)
    book = pq_train(spark, emb, m=8, k=16, iters=3)
    codes = pq_encode(emb, book, m=8)
    q = _emb_df(spark, X[:8])
    got = pq_adc_topk(spark, codes, book, q, m=8, k=10)
    mine = {}
    for r in got.collect():
        mine.setdefault(r["query_id"], set()).add(r["match_id"])
    Xd = X.astype(np.float64)
    recs = []
    for qid in range(8):
        d = ((Xd - Xd[qid]) ** 2).sum(axis=1)
        d[qid] = np.inf
        true = set(np.argsort(d, kind="stable")[:10])
        recs.append(len(mine[qid] & true) / 10.0)
    assert sum(recs) / len(recs) >= 0.5, recs
