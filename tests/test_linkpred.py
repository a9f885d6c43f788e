"""Clustering coefficient + common-neighbor link prediction exact tests
(north-rule analytics extensions — SURVEY.md §2.7; no reference twin)."""

from __future__ import annotations

import itertools

import pytest

from montecarlopagerank_spark.algos.linkpred import common_neighbors_topk
from montecarlopagerank_spark.algos.triangles import clustering_coefficient


def rows(df):
    return {tuple(r) for r in df.collect()}


def test_cc_k4(spark):
    # complete K4: every vertex has d=3, T=3, cc = 2*3/(3*2) = 1.0
    pairs = [(a, b) for a in range(4) for b in range(4) if a < b]
    e = spark.createDataFrame(pairs, "src long, dst long")
    assert rows(clustering_coefficient(spark, e)) == {
        (v, 3, 3, 1.0) for v in range(4)
    }


def test_cc_path_and_triangle(spark):
    # triangle 0-1-2 plus pendant 2-3: cc(0)=cc(1)=1, cc(2)=2*1/(3*2)=1/3,
    # cc(3)=0 (degree 1)
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (2, 3)], "src long, dst long"
    )
    assert rows(clustering_coefficient(spark, e)) == {
        (0, 2, 1, 1.0),
        (1, 2, 1, 1.0),
        (2, 3, 1, round(1 / 3, 6)),
        (3, 1, 0, 0.0),
    }


def _brute_common_neighbors(pairs, cap):
    """Plain-Python oracle: hub-capped common neighbors + full-degree
    Jaccard over the simple undirected closure."""
    und = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    nbrs: dict = {}
    for x, y in und:
        nbrs.setdefault(x, set()).add(y)
        nbrs.setdefault(y, set()).add(x)
    deg = {v: len(ns) for v, ns in nbrs.items()}
    out = {}
    for a, b in itertools.combinations(sorted(nbrs), 2):
        if (a, b) in und:
            continue
        common = sum(
            1 for w in nbrs[a] & nbrs[b] if deg[w] <= cap
        )
        if common:
            out[(a, b)] = (
                common,
                round(common / (deg[a] + deg[b] - common), 6),
            )
    return out


def test_common_neighbors_square(spark):
    # 4-cycle 0-1-2-3-0: diagonals (0,2) and (1,3) each share 2 neighbors,
    # jaccard = 2/(2+2-2) = 1.0
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0)], "src long, dst long"
    )
    got = rows(common_neighbors_topk(spark, e, k=10))
    assert got == {(0, 2, 2, 1.0), (1, 3, 2, 1.0)}


def test_common_neighbors_vs_brute(spark, gnutella_mini_pairs):
    cap = 8
    exp = _brute_common_neighbors(gnutella_mini_pairs, cap)
    k = len(exp) + 5  # no cut: the whole candidate set must match
    e = spark.createDataFrame(gnutella_mini_pairs, "src long, dst long")
    got = {
        (r.a, r.b): (r.common, r.jaccard_r6)
        for r in common_neighbors_topk(
            spark, e, k=k, max_apex_degree=cap
        ).collect()
    }
    assert got == exp


def test_common_neighbors_hub_cap_excludes_hub_wedges(spark):
    # star: hub 0 with spokes 1..9. Uncapped, every spoke pair shares the
    # hub; with cap < 9 the hub mediates nothing -> no candidates at all.
    e = spark.createDataFrame(
        [(0, i) for i in range(1, 10)], "src long, dst long"
    )
    assert common_neighbors_topk(spark, e, k=100, max_apex_degree=8).count() == 0
    full = common_neighbors_topk(spark, e, k=100, max_apex_degree=9)
    assert full.count() == 36  # C(9,2) spoke pairs, one common neighbor each
    r = full.orderBy("a", "b").first()
    assert (r.common, r.jaccard_r6) == (1, 1.0)  # 1/(1+1-1)


def test_topk_cut_is_deterministic_total_order(spark):
    # ties in `common` are cut by (a, b): k=1 on the square must return (0,2)
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0)], "src long, dst long"
    )
    got = rows(common_neighbors_topk(spark, e, k=1))
    assert got == {(0, 2, 2, 1.0)}


def test_adamic_adar_square_with_pendant(spark):
    """Cycle 0-1-2-3-0 plus pendant 0-4, closed-form AA scores."""
    import math

    from montecarlopagerank_spark.algos.linkpred import adamic_adar_topk

    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0), (0, 4)], "src long, dst long"
    )
    got = {(r["a"], r["b"]): (r["common"], r["aa_r6"]) for r in
           adamic_adar_topk(spark, e, k=50).collect()}
    ln2, ln3 = math.log(2), math.log(3)
    want = {
        (0, 2): (2, round(2 / ln2, 6)),        # mediators 1, 3 (deg 2)
        (1, 3): (2, round(1 / ln3 + 1 / ln2, 6)),  # mediators 0 (3), 2 (2)
        (1, 4): (1, round(1 / ln3, 6)),        # mediator 0 (deg 3)
        (3, 4): (1, round(1 / ln3, 6)),
    }
    assert got == want


def test_adamic_adar_hub_cap_excludes_mediator(spark):
    """A star hub above the cap mediates nothing; its leaves score 0
    (absent), while a low-degree mediator still counts."""
    from montecarlopagerank_spark.algos.linkpred import adamic_adar_topk

    star = [(100, i) for i in range(10)]  # hub deg 10
    extra = [(0, 50), (1, 50)]            # mediator 50 (deg 2) for (0,1)
    e = spark.createDataFrame(star + extra, "src long, dst long")
    got = {(r["a"], r["b"]) for r in
           adamic_adar_topk(spark, e, k=500, max_apex_degree=5).collect()}
    assert (0, 1) in got
    assert not any(a >= 2 and b <= 9 for a, b in got if (a, b) != (0, 1))


def test_negative_edges_deterministic_valid(spark):
    """Sampled pairs are never real edges or self-pairs, ranks are
    1..k contiguous per src, and a python twin reproduces them exactly."""
    import hashlib

    from montecarlopagerank_spark.algos.linkpred import negative_edges

    pairs = [(i, (i * 7 + 1) % 20) for i in range(20)] + [(0, 5), (3, 9)]
    e = spark.createDataFrame(pairs, "src long, dst long")
    got = negative_edges(spark, e, k=3, oversample=4).collect()

    def bucket(s, salt):
        return int(hashlib.md5((salt + s).encode()).hexdigest()[:8], 16)

    verts = sorted({v for p in pairs for v in p},
                   key=lambda v: (bucket(str(v), "vidx:") % 1024, v))
    real = set(pairs)
    want = {}
    for s in sorted({a for a, _ in pairs}):
        out = []
        for j in range(12):
            d = verts[bucket(f"{s}#{j}", "neg:") % len(verts)]
            if d != s and (s, d) not in real:
                out.append(d)
            if len(out) == 3:
                break
        want[s] = out
    got_by_src = {}
    for r in sorted(got, key=lambda r: (r["src"], r["neg_rank"])):
        got_by_src.setdefault(r["src"], []).append(r["dst"])
    assert got_by_src == {s: o for s, o in want.items() if o}
    for r in got:
        assert (r["src"], r["dst"]) not in real and r["src"] != r["dst"]
