"""PCA / whitening for embedding columns — the standard pre-pass before
clustering, IVF coarse quantization, or near-dup thresholds (reduces a
64-1536-dim embedding to the k directions that carry the variance;
whitening equalizes them so cosine/L2 thresholds mean the same thing in
every direction).

New-engine scope (the reference ships no vector ops). Two-phase design,
the same shape Spark MLlib's RowMatrix PCA uses, re-expressed on the
DataFrame API:

1. **Distributed moment pass** (the only part that touches all N rows):
   per-partition numpy partials of the Gram matrix XᵀX, the coordinate
   sum Σx, and the count via ``mapInPandas`` (Arrow batches → one
   ``X.T @ X`` matmul per batch — no per-row Python). Each partition
   emits at most d(d+1)/2 + d + 1 tiny rows; a single ``groupBy(i,j)``
   reduces them map-side-combined. Shuffled bytes are O(partitions·d²),
   independent of N — at 100 TB the moment pass is one corpus scan.
2. **Driver-side eigensolve** of the d×d covariance (d ≤ a few thousand
   → milliseconds in LAPACK; the N×d data never leaves the executors).
   Deterministic component signs: each eigenvector's largest-|coeff|
   coordinate is made positive (ties → lowest index), so reruns and
   engines agree up to fp summation noise.
3. **Projection stays JVM-side**: y = Wᵀ(x − μ) is built from literal
   arrays with ``zip_with``/``aggregate`` folds — whole-stage codegen,
   no Python in the N-row hot path.

Determinism: exact up to fp summation order of the moment pass (partial
sums depend on partitioning; ~1e-12 relative on unit-scale data).
Outputs are rounded (default 4 dp) so the corpus-level result is stable
across parallelism in practice; the pytest oracle compares against
numpy's full PCA at 1e-6.
"""

from __future__ import annotations

from typing import Any, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _moment_pass(vecs: DataFrame, vec_col: str) -> tuple[np.ndarray, np.ndarray, int]:
    """ONE distributed scan → (gram d×d, sum d, n) on the driver."""

    def parts(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        gram = None
        s = None
        n = 0
        for pdf in it:
            if not len(pdf):
                continue
            X = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            gram = X.T @ X if gram is None else gram + X.T @ X
            s = X.sum(axis=0) if s is None else s + X.sum(axis=0)
            n += len(X)
        if n == 0:
            return
        d = gram.shape[0]
        iu, ju = np.triu_indices(d)
        yield pd.DataFrame(
            {
                "i": np.concatenate([iu, np.arange(d), [-1]]),
                "j": np.concatenate([ju, np.full(d, -1), [-1]]),
                "val": np.concatenate([gram[iu, ju], s, [float(n)]]),
            }
        )

    rows = (
        vecs.select(vec_col)
        .mapInPandas(parts, "i int, j int, val double")
        .groupBy("i", "j")
        .agg(F.sum("val").alias("val"))
        .collect()
    )
    ent = {(r["i"], r["j"]): r["val"] for r in rows}
    n = int(ent.pop((-1, -1)))
    d = max(i for i, j in ent) + 1
    s = np.array([ent.pop((i, -1)) for i in range(d)])
    gram = np.zeros((d, d))
    for (i, j), v in ent.items():
        gram[i, j] = gram[j, i] = v
    return gram, s, n


def fit_pca(
    vecs: DataFrame, vec_col: str = "embedding", k: int = 8
) -> dict[str, Any]:
    """Fit a PCA model: returns ``{"mean": d, "components": k×d (rows =
    descending-eigenvalue order, deterministic signs), "eigenvalues": k,
    "n": N}``. Covariance uses the 1/N (population) convention."""
    gram, s, n = _moment_pass(vecs, vec_col)
    if n < 2:
        raise ValueError(f"need ≥2 vectors to fit PCA, got {n}")
    mu = s / n
    cov = gram / n - np.outer(mu, mu)
    w, v = np.linalg.eigh(cov)  # ascending
    order = np.argsort(w)[::-1][:k]
    eig = np.maximum(w[order], 0.0)
    comps = v[:, order].T  # k×d
    # deterministic sign: largest-|coeff| coordinate positive, ties → lowest idx
    for r in range(comps.shape[0]):
        pivot = int(np.argmax(np.abs(np.round(comps[r], 12))))
        if comps[r, pivot] < 0:
            comps[r] = -comps[r]
    return {"mean": mu, "components": comps, "eigenvalues": eig, "n": n}


def transform_pca(
    vecs: DataFrame,
    model: dict[str, Any],
    vec_col: str = "embedding",
    out_col: str = "pc",
    whiten: bool = False,
    eps: float = 1e-9,
) -> DataFrame:
    """Project (and optionally whiten) every vector: ``out_col`` =
    Wᵀ(x − μ) [· diag(1/√λ)]. Pure JVM expressions (literal-array
    ``zip_with`` + ``aggregate`` folds) — no Python in the N-row path."""
    mu = model["mean"]
    comps = np.asarray(model["components"], dtype=np.float64)
    if whiten:
        comps = comps / np.sqrt(np.asarray(model["eigenvalues"]) + eps)[:, None]
    mu_arr = F.array(*[F.lit(float(m)) for m in mu])
    centered = F.zip_with(
        F.transform(F.col(vec_col), lambda x: x.cast("double")),
        mu_arr,
        lambda a, b: a - b,
    )
    tmp = vecs.withColumn("_ctr", centered)
    projs = [
        F.aggregate(
            F.zip_with(
                F.col("_ctr"),
                F.array(*[F.lit(float(c)) for c in comps[r]]),
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        for r in range(comps.shape[0])
    ]
    return tmp.withColumn(out_col, F.array(*projs)).drop("_ctr")


def dim_stats(vecs: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-dimension mean / population variance of an embedding column —
    the sanity pass before PCA (spots dead or exploding dims). ONE
    posexplode scan + a d-key hash agg, fully map-side combined; hash-
    oracled against a DuckDB lateral-unnest twin (contract.py)."""
    ex = vecs.select(
        F.posexplode(F.transform(F.col(vec_col), lambda x: x.cast("double"))).alias(
            "dim", "x"
        )
    )
    return ex.groupBy("dim").agg(
        F.round(F.avg("x"), 6).alias("mean_r6"),
        F.round(F.avg(F.col("x") * F.col("x")) - F.avg("x") * F.avg("x"), 6).alias(
            "var_r6"
        ),
    )


def pca_project(
    spark: SparkSession,
    vecs: DataFrame,
    vec_col: str = "embedding",
    k: int = 8,
    whiten: bool = False,
) -> tuple[DataFrame, dict[str, Any]]:
    """fit + transform in one call (the common path)."""
    model = fit_pca(vecs, vec_col=vec_col, k=k)
    return transform_pca(vecs, model, vec_col=vec_col, whiten=whiten), model


def random_projection(
    vecs: DataFrame,
    out_dim: int,
    seed: int = 7,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Johnson-Lindenstrauss random projection d → ``out_dim`` with a
    deterministic ±1/√k sign matrix (Achlioptas, JCSS 2003: the sparse
    sign construction satisfies the JL lemma) — the cheap distance-
    preserving compressor BEFORE ANN/clustering at 100 TB, where a
    learned projection (PCA) would itself need a fit pass. The matrix
    entry (r, j) is a pure function of ``md5("rp:{seed}:{r}:{j}")``, so
    reruns, engines, and cluster sizes build the identical matrix with
    NOTHING stored or broadcast beyond k·d plan literals.

    Emits long-form ``(id, dim, val_r6)`` (k rows per vector; r6 makes
    the IEEE fold hash-stable). Scale shape: the matrix is baked into
    the plan as literal arrays and each output dim is one sequential
    ``aggregate`` fold inside codegen — zero Python, zero shuffles, one
    narrow ``posexplode``; the DuckDB twin replays the identical left
    fold via ``list_reduce`` (contract.py)."""
    if out_dim <= 0:
        raise ValueError("out_dim must be positive")
    import hashlib
    import math

    first = vecs.select(F.size(vec_col).alias("d")).first()
    if first is None:
        return vecs.sparkSession.createDataFrame(
            [], f"{id_col} long, dim long, val_r6 double"
        )
    d = int(first["d"])
    inv = 1.0 / math.sqrt(out_dim)

    def w(r: int, j: int) -> float:
        h = hashlib.md5(f"rp:{seed}:{r}:{j}".encode()).hexdigest()
        return inv if int(h[0], 16) % 2 == 0 else -inv

    xd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    projs = [
        F.round(
            F.aggregate(
                F.zip_with(
                    xd,
                    F.array(*[F.lit(w(r, j)) for j in range(d)]),
                    lambda a, b: a * b,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        )
        for r in range(out_dim)
    ]
    return vecs.select(
        F.col(id_col), F.posexplode(F.array(*projs)).alias("dim", "val_r6")
    ).select(F.col(id_col), F.col("dim").cast("long").alias("dim"), "val_r6")
