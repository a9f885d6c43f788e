"""Unit tests for pipeline/embeddings.py: PCA fit vs numpy's exact
eigendecomposition, whitening, sign determinism, dim stats."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from montecarlopagerank_spark.pipeline.embeddings import (
    dim_stats,
    fit_pca,
    pca_project,
    transform_pca,
)


def _vec_df(spark, X):
    rows = [(i, [float(x) for x in row]) for i, row in enumerate(X)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _numpy_pca(X, k):
    X = X.astype(np.float64)
    mu = X.mean(axis=0)
    cov = np.cov(X, rowvar=False, bias=True)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order].T
    for r in range(k):
        p = int(np.argmax(np.abs(np.round(comps[r], 12))))
        if comps[r, p] < 0:
            comps[r] = -comps[r]
    return mu, comps, np.maximum(w[order], 0.0)


@pytest.fixture(scope="module")
def gauss_data():
    rng = np.random.default_rng(11)
    # anisotropic: distinct eigenvalues so components are unambiguous
    A = rng.normal(size=(12, 12)) * np.linspace(3.0, 0.2, 12)
    return (rng.normal(size=(300, 12)) @ A).astype(np.float32)


def test_fit_pca_matches_numpy(spark, gauss_data):
    X = gauss_data
    model = fit_pca(_vec_df(spark, X), k=5)
    mu, comps, eig = _numpy_pca(X, 5)
    np.testing.assert_allclose(model["mean"], mu, atol=1e-9)
    np.testing.assert_allclose(model["eigenvalues"], eig, rtol=1e-9)
    np.testing.assert_allclose(model["components"], comps, atol=1e-7)
    assert model["n"] == 300


def test_projection_matches_numpy(spark, gauss_data):
    X = gauss_data
    df = _vec_df(spark, X)
    out, model = pca_project(spark, df, k=4)
    got = {r["vec_id"]: np.array(r["pc"]) for r in out.collect()}
    mu, comps, _ = _numpy_pca(X, 4)
    want = (X.astype(np.float64) - mu) @ comps.T
    for i in range(len(X)):
        np.testing.assert_allclose(got[i], want[i], atol=1e-6)


def test_whitened_projection_has_unit_variance(spark, gauss_data):
    df = _vec_df(spark, gauss_data)
    model = fit_pca(df, k=4)
    out = transform_pca(df, model, whiten=True)
    Y = np.array([r["pc"] for r in out.collect()])
    np.testing.assert_allclose(Y.var(axis=0), np.ones(4), rtol=1e-5)
    np.testing.assert_allclose(Y.mean(axis=0), np.zeros(4), atol=1e-9)


def test_pca_sign_deterministic_across_partitioning(spark, gauss_data):
    df2 = _vec_df(spark, gauss_data).repartition(2)
    df7 = _vec_df(spark, gauss_data).repartition(7)
    m2 = fit_pca(df2, k=3)
    m7 = fit_pca(df7, k=3)
    np.testing.assert_allclose(
        m2["components"], m7["components"], atol=1e-9
    )


def test_fit_pca_rejects_tiny_input(spark):
    with pytest.raises(ValueError):
        fit_pca(_vec_df(spark, np.ones((1, 4), dtype=np.float32)))


def test_dim_stats_exact(spark):
    X = np.array([[1.0, 2.0], [3.0, 6.0]], dtype=np.float32)
    got = {r["dim"]: (r["mean_r6"], r["var_r6"]) for r in
           dim_stats(_vec_df(spark, X)).collect()}
    assert got == {0: (2.0, 1.0), 1: (4.0, 4.0)}


def test_random_projection_matches_numpy_and_preserves_norms(spark, gauss_data):
    import hashlib
    import math

    import numpy as np

    from montecarlopagerank_spark.pipeline.embeddings import random_projection

    K, SEED = 12, 7
    emb = _vec_df(spark, gauss_data)
    rows = emb.select("vec_id", "embedding").collect()
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in rows}
    d = len(next(iter(vecs.values())))
    inv = 1.0 / math.sqrt(K)
    R = np.array(
        [
            [
                inv
                if int(hashlib.md5(f"rp:{SEED}:{r}:{j}".encode()).hexdigest()[0], 16)
                % 2 == 0
                else -inv
                for j in range(d)
            ]
            for r in range(K)
        ]
    )
    got = {}
    for r in random_projection(emb, out_dim=K, seed=SEED).collect():
        got.setdefault(r.vec_id, {})[r.dim] = r.val_r6
    for vid, v in vecs.items():
        want = R @ v
        for r in range(K):
            assert got[vid][r] == pytest.approx(round(float(want[r]), 6), abs=2e-6)
    # JL property on this blob data: projected norms concentrate around
    # the originals (generous band — K is small)
    ratios = [
        float(np.linalg.norm(R @ v) / np.linalg.norm(v))
        for v in vecs.values()
        if np.linalg.norm(v) > 0
    ]
    assert 0.4 < min(ratios) and max(ratios) < 1.8
