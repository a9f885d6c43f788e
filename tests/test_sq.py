"""Scalar quantization: exact code parity with a numpy twin, dequantized
cosine parity, and a recall floor vs exact brute-force cosine."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from montecarlopagerank_spark.pipeline.similarity import cosine_topk_bruteforce
from montecarlopagerank_spark.pipeline.sq import sq_encode, sq_topk, sq_train


def _emb_df(spark, X):
    return spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(X)],
        "vec_id long, embedding array<float>",
    )


def _np_sq(X):
    """Numpy twin: float32-widened bounds, floor((x-mn)/(mx-mn)*256)
    clamped to [0, 255], zero-width dims → 0."""
    X = X.astype(np.float32).astype(np.float64)
    mn, mx = X.min(axis=0), X.max(axis=0)
    width = mx - mn
    safe = np.where(width == 0, 1.0, width)
    codes = np.clip(np.floor((X - mn) / safe * 256.0), 0, 255).astype(int)
    codes[:, width == 0] = 0
    deq = mn + (codes + 0.5) * (width / 256.0)
    return mn, mx, codes, deq


@pytest.fixture(scope="module")
def X():
    rng = np.random.default_rng(7)
    X = rng.normal(size=(120, 8)).astype(np.float32)
    X[:, 3] = 2.5  # a zero-width dimension
    return X


def test_sq_codes_match_numpy(spark, X):
    emb = _emb_df(spark, X)
    mins, maxes = sq_train(emb)
    _, _, want, _ = _np_sq(X)
    got = {r["vec_id"]: list(r["codes"]) for r in sq_encode(emb, mins, maxes).collect()}
    for i in range(len(X)):
        assert got[i] == list(want[i]), i
    assert all(c == 0 for c in (got[i][3] for i in range(len(X))))


def test_sq_train_bounds_exact(spark, X):
    emb = _emb_df(spark, X)
    mins, maxes = sq_train(emb)
    mn, mx, _, _ = _np_sq(X)
    assert mins == pytest.approx(list(mn), abs=0)
    assert maxes == pytest.approx(list(mx), abs=0)


def test_sq_topk_matches_numpy_dequant_cosine(spark, X):
    emb = _emb_df(spark, X)
    mins, maxes = sq_train(emb)
    codes = sq_encode(emb, mins, maxes)
    got = sq_topk(
        spark, codes, mins, maxes, emb.filter(F.col("vec_id") < 5), k=10
    ).collect()
    _, _, _, deq = _np_sq(X)
    Q = X.astype(np.float32).astype(np.float64)
    for r in got:
        q, nb = Q[r["query_id"]], deq[r["neighbour_id"]]
        want = float(q @ nb / (np.linalg.norm(q) * np.linalg.norm(nb)))
        assert r["cos_r6"] == pytest.approx(want, abs=5e-7)
    # exact top-10 per query vs the numpy ranking
    for qid in range(5):
        sims = {
            j: round(float(Q[qid] @ deq[j] / (np.linalg.norm(Q[qid]) * np.linalg.norm(deq[j]))), 6)
            for j in range(len(X)) if j != qid
        }
        want_order = sorted(sims, key=lambda j: (-sims[j], j))[:10]
        got_order = [r["neighbour_id"] for r in sorted(
            (r for r in got if r["query_id"] == qid), key=lambda r: r["rn"]
        )]
        assert got_order == want_order, qid


def test_sq_recall_floor_vs_bruteforce(spark, X):
    emb = _emb_df(spark, X)
    queries = emb.filter(F.col("vec_id") < 10)
    exact = cosine_topk_bruteforce(emb, queries, k=10)
    mins, maxes = sq_train(emb)
    approx = sq_topk(spark, sq_encode(emb, mins, maxes), mins, maxes, queries, k=10)
    e = {(r["query_id"], r["neighbour_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbour_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.8, recall  # 8-bit dequantization barely moves cosine
