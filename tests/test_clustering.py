"""Tests: deterministic k-means + IVF ANN (pipeline/clustering.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from montecarlopagerank_spark.pipeline.clustering import ivf_topk, kmeans

DIM = 8
N = 120
K = 5


@pytest.fixture(scope="module")
def emb(spark):
    # deterministic blob data: 5 well-separated centers + small jitter,
    # so cluster recovery (not just mechanics) is checkable
    rng = np.random.RandomState(7)
    centers = rng.randn(K, DIM) * 10
    rows = []
    for i in range(N):
        c = i % K
        v = centers[c] + rng.randn(DIM) * 0.1
        rows.append((i, [float(x) for x in v], c))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).persist()


def test_kmeans_recovers_separated_blobs(spark, emb):
    a, cents, _ = kmeans(spark, emb, k=K, iters=4)
    rows = a.collect()
    assert len(rows) == N
    lab = {r["vec_id"]: r["label"] for r in emb.collect()}
    # every k-means cluster should be label-pure on blobs this separated
    byc: dict[int, set] = {}
    for r in rows:
        byc.setdefault(r["cid"], set()).add(lab[r["vid"]])
    assert all(len(s) == 1 for s in byc.values())
    assert len(byc) == K


def test_kmeans_deterministic_rerun(spark, emb):
    a1, _, _ = kmeans(spark, emb, k=K, iters=3)
    a2, _, _ = kmeans(spark, emb.repartition(7), k=K, iters=3)
    r1 = {(r["vid"], r["cid"]) for r in a1.collect()}
    r2 = {(r["vid"], r["cid"]) for r in a2.collect()}
    assert r1 == r2


def test_kmeans_iterations_do_not_increase_inertia(spark, emb):
    a0, _, _ = kmeans(spark, emb, k=K, iters=0)
    a3, _, _ = kmeans(spark, emb, k=K, iters=3)
    i0 = a0.agg(F.sum("d2r")).collect()[0][0]
    i3 = a3.agg(F.sum("d2r")).collect()[0][0]
    assert i3 <= i0 + 1e-9


def test_kmeans_empty_cluster_keeps_seed(spark):
    # 2 distinct points, k=3: one cluster must stay empty and keep its
    # seed centroid; assignment still covers every row, no crash
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [0.0, 0.0]), (3, [9.0, 9.0])],
        "vec_id long, embedding array<float>",
    )
    a, cents, _ = kmeans(spark, df, k=3, iters=2)
    assert a.count() == 3
    assert cents.count() == 3


def test_ivf_exact_within_probed_cells(spark, emb):
    """The IVF result must equal a numpy replication of the same
    probe-then-rank logic (exactness of the plumbing; recall vs brute
    force is data-dependent and separate)."""
    queries = emb.filter(F.col("vec_id") < 6)
    got = ivf_topk(
        spark, emb, queries, k=5, nprobe=2, n_clusters=K, iters=3
    ).collect()

    a, cents, _ = kmeans(spark, emb, k=K, iters=3)
    asg = {r["vid"]: r["cid"] for r in a.collect()}
    C = {r["cid"]: np.array(r["cvec"]) for r in cents.collect()}
    V = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
         for r in emb.collect()}

    expected = set()
    for q in range(6):
        qv = V[q]
        cells = sorted(
            C, key=lambda c: (round(float(((qv - C[c]) ** 2).sum()), 6), c)
        )[:2]
        cand = [
            (round(float(qv @ V[i]) / float(np.linalg.norm(qv) * np.linalg.norm(V[i])), 6), i)
            for i in V if i != q and asg[i] in cells
        ]
        cand.sort(key=lambda t: (-t[0], t[1]))
        for rank, (cos, i) in enumerate(cand[:5], start=1):
            expected.add((q, rank, i))
    assert {(r["query_id"], r["rank"], r["match_id"]) for r in got} == expected


def test_ivf_good_recall_on_clustered_data(spark, emb):
    """On well-clustered data the true neighbours live in the query's
    own cell, so nprobe=2 recall vs brute force should be ~1."""
    from montecarlopagerank_spark.pipeline.similarity import cosine_topk_bruteforce

    queries = emb.filter(F.col("vec_id") < 6)
    ivf = ivf_topk(spark, emb, queries, k=5, nprobe=2, n_clusters=K, iters=3)
    bf = cosine_topk_bruteforce(emb, queries, k=5)
    ivs = {(r["query_id"], r["match_id"]) for r in ivf.collect()}
    bfs = {(r["query_id"], r["neighbour_id"]) for r in bf.collect()}
    assert len(ivs & bfs) / len(bfs) >= 0.95


def dbscan_naive(vecs, thr, min_pts):
    """Python twin of dbscan_exact on {id: np.array} (rounded cosine)."""
    ids = sorted(vecs)
    nbrs = {i: set() for i in ids}
    for x in ids:
        for y in ids:
            if x < y:
                c = float(vecs[x] @ vecs[y]) / float(
                    np.linalg.norm(vecs[x]) * np.linalg.norm(vecs[y])
                )
                if round(c, 6) >= thr:
                    nbrs[x].add(y)
                    nbrs[y].add(x)
    core = {i for i in ids if len(nbrs[i]) >= min_pts}
    # CC over core-core edges, label = min id
    lbl = {i: i for i in core}
    changed = True
    while changed:
        changed = False
        for x in core:
            for y in nbrs[x] & core:
                m = min(lbl[x], lbl[y])
                if lbl[x] != m or lbl[y] != m:
                    lbl[x] = lbl[y] = m
                    changed = True
    out = {}
    for i in ids:
        if i in core:
            out[i] = ("core", lbl[i])
        else:
            cl = [lbl[n] for n in nbrs[i] if n in core]
            out[i] = ("border", min(cl)) if cl else ("noise", None)
    return out


def test_dbscan_recovers_blobs_and_matches_twin(spark, emb):
    from montecarlopagerank_spark.pipeline.clustering import dbscan_exact

    rows = emb.select("vec_id", "embedding").collect()
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in rows}
    got = {
        r.vec_id: (r.role, r.cluster_id)
        for r in dbscan_exact(
            spark, emb, sim_threshold=0.8, min_pts=3
        ).collect()
    }
    want = dbscan_naive(vecs, 0.8, 3)
    assert got == want
    # well-separated blobs: every point is core, clusters = the 5 labels
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    by_cluster: dict = {}
    for v, (role, cl) in got.items():
        if cl is not None:
            by_cluster.setdefault(cl, set()).add(labels[v])
    assert all(len(s) == 1 for s in by_cluster.values())
    assert len(by_cluster) == K


def test_dbscan_noise_and_border(spark):
    from montecarlopagerank_spark.pipeline.clustering import dbscan_exact

    # 3 mutually-close vectors (core at min_pts=2), one vector close to
    # only ONE of them (border), one orthogonal (noise)
    base = np.eye(4)
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.99, 0.14, 0.0, 0.0]),
        (2, [0.99, -0.14, 0.0, 0.0]),
        (3, [0.55, 0.83, 0.0, 0.0]),   # close to 1 only (cos ≈ 0.66 vs thr 0.9 for 0/2)
        (4, [0.0, 0.0, 1.0, 0.0]),     # orthogonal: noise
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        r.vec_id: (r.role, r.cluster_id)
        for r in dbscan_exact(spark, df, sim_threshold=0.9, min_pts=2).collect()
    }
    vecs = {i: np.array(v, dtype=np.float64) for i, v in rows}
    assert got == dbscan_naive(vecs, 0.9, 2)
    assert got[4] == ("noise", None)
