"""Unit tests for the round-3 link-graph additions: personalized PageRank
(pagerank_power(sources=...)), HITS, and multi-source BFS hop distance.
Exact closed-form expectations on tiny graphs + numpy twins on the
200-vertex power-law fixture."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from montecarlopagerank_spark.algos.bfs import bfs_hops
from montecarlopagerank_spark.algos.hits import hits
from montecarlopagerank_spark.algos.pagerank_power import EPS, pagerank_power
from tests.conftest import edges_df


# ---------------------------------------------------------------------
# personalized PageRank
# ---------------------------------------------------------------------

def _ppr_numpy(pairs, src_ids, iters, eps=EPS):
    n = max(max(a, b) for a, b in pairs) + 1
    out = [[] for _ in range(n)]
    for a, b in pairs:
        out[a].append(b)
    p = np.zeros(n)
    p[list(src_ids)] = 1.0 / len(src_ids)
    r = p.copy()
    for _ in range(iters):
        nxt = np.zeros(n)
        m = 0.0
        for v in range(n):
            if out[v]:
                share = r[v] / len(out[v])
                for w in out[v]:
                    nxt[w] += share
            else:
                m += r[v]
        r = (eps + (1 - eps) * m) * p + (1 - eps) * nxt
    return r


def test_ppr_matches_numpy_twin(spark, gnutella_mini, gnutella_mini_pairs):
    srcs = spark.createDataFrame([(0,), (1,), (2,)], "v long")
    ranks, info = pagerank_power(
        spark, gnutella_mini, tol=0.0, max_iters=4, sources=srcs
    )
    got = {r["v"]: r["rank"] for r in ranks.collect()}
    want = _ppr_numpy(gnutella_mini_pairs, [0, 1, 2], iters=4)
    assert info["n_sources"] == 3
    for v, r in got.items():
        assert r == pytest.approx(want[v], rel=1e-9, abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_ppr_uniform_sources_equals_plain_pagerank(spark, cycle5):
    """p = uniform over ALL vertices must reproduce standard PageRank."""
    all_v = spark.createDataFrame([(i,) for i in range(5)], "v long")
    pers, _ = pagerank_power(spark, cycle5, tol=0.0, max_iters=6, sources=all_v)
    plain, _ = pagerank_power(spark, cycle5, tol=0.0, max_iters=6)
    a = {r["v"]: r["rank"] for r in pers.collect()}
    b = {r["v"]: r["rank"] for r in plain.collect()}
    for v in a:
        assert a[v] == pytest.approx(b[v], rel=1e-12)


def test_ppr_unreachable_vertices_rank_zero(spark):
    # two disjoint 2-cycles; sources in the first → second stays at 0
    e = edges_df(spark, [(0, 1), (1, 0), (2, 3), (3, 2)])
    srcs = spark.createDataFrame([(0,)], "v long")
    ranks, _ = pagerank_power(spark, e, tol=0.0, max_iters=8, sources=srcs)
    got = {r["v"]: r["rank"] for r in ranks.collect()}
    assert got[2] == 0.0 and got[3] == 0.0
    assert got[0] > 0.0 and got[1] > 0.0
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-12)


def test_ppr_empty_source_set_raises(spark, cycle5):
    srcs = spark.createDataFrame([(99,)], "v long")  # not in graph
    with pytest.raises(ValueError):
        pagerank_power(spark, cycle5, tol=0.0, max_iters=2, sources=srcs)


# ---------------------------------------------------------------------
# HITS
# ---------------------------------------------------------------------

def _hits_numpy(pairs, iters):
    n = max(max(a, b) for a, b in pairs) + 1
    h = np.ones(n)
    h /= h.sum()
    a = np.zeros(n)
    for _ in range(iters):
        a = np.zeros(n)
        for u, v in pairs:
            a[v] += h[u]
        a /= a.sum()
        h = np.zeros(n)
        for u, v in pairs:
            h[u] += a[v]
        h /= h.sum()
    return h, a


def test_hits_star_closed_form(spark, star5):
    """Spokes 1..4 → hub 0: vertex 0 is the only authority, spokes are
    the (equal) hubs, at every iteration count."""
    scores, info = hits(spark, star5, iters=3)
    got = {r["v"]: (r["hub"], r["auth"]) for r in scores.collect()}
    assert info["n"] == 5
    assert got[0][0] == 0.0 and got[0][1] == pytest.approx(1.0)
    for v in range(1, 5):
        assert got[v][0] == pytest.approx(0.25)
        assert got[v][1] == 0.0


def test_hits_matches_numpy_twin(spark, gnutella_mini, gnutella_mini_pairs):
    scores, _ = hits(spark, gnutella_mini, iters=5)
    got = {r["v"]: (r["hub"], r["auth"]) for r in scores.collect()}
    h, a = _hits_numpy(gnutella_mini_pairs, iters=5)
    for v, (hv, av) in got.items():
        assert hv == pytest.approx(h[v], rel=1e-9, abs=1e-12)
        assert av == pytest.approx(a[v], rel=1e-9, abs=1e-12)
    assert sum(x[0] for x in got.values()) == pytest.approx(1.0, abs=1e-9)
    assert sum(x[1] for x in got.values()) == pytest.approx(1.0, abs=1e-9)


def test_hits_multigraph_duplicate_edges_count(spark):
    """(0→2) twice vs (1→2) once: hub 0 gets twice the weight of hub 1."""
    e = edges_df(spark, [(0, 2), (0, 2), (1, 2)])
    scores, _ = hits(spark, e, iters=2)
    got = {r["v"]: r["hub"] for r in scores.collect()}
    assert got[0] == pytest.approx(2.0 / 3.0)
    assert got[1] == pytest.approx(1.0 / 3.0)


# ---------------------------------------------------------------------
# BFS hop distance
# ---------------------------------------------------------------------

def test_bfs_path_graph_hops(spark):
    # 0-1-2-3-4-5 path (directed edges, undirected traversal), source {0}
    e = edges_df(spark, [(i, i + 1) for i in range(5)])
    srcs = spark.createDataFrame([(0,)], "v long")
    dist, info = bfs_hops(spark, e, srcs, max_hops=3)
    got = {r["v"]: r["hops"] for r in dist.collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}  # 4, 5 beyond the cap
    assert info["rounds"] == 3


def test_bfs_directed_vs_undirected(spark):
    e = edges_df(spark, [(1, 0), (0, 2)])
    srcs = spark.createDataFrame([(0,)], "v long")
    und = {r["v"]: r["hops"] for r in bfs_hops(spark, e, srcs, max_hops=3)[0].collect()}
    dird = {
        r["v"]: r["hops"]
        for r in bfs_hops(spark, e, srcs, max_hops=3, directed=True)[0].collect()
    }
    assert und == {0: 0, 1: 1, 2: 1}
    assert dird == {0: 0, 2: 1}  # 1→0 is not traversable from 0


def test_bfs_multi_source_takes_min(spark):
    # path 0-1-2-3-4, sources {0, 4} → middle vertex 2 is 2 hops from both
    e = edges_df(spark, [(i, i + 1) for i in range(4)])
    srcs = spark.createDataFrame([(0,), (4,)], "v long")
    dist, info = bfs_hops(spark, e, srcs, max_hops=6)
    got = {r["v"]: r["hops"] for r in dist.collect()}
    assert got == {0: 0, 4: 0, 1: 1, 3: 1, 2: 2}
    assert info["rounds"] == 2  # frontier empties after round 3's no-op


def test_bfs_early_stop_on_empty_frontier(spark, cycle5):
    srcs = spark.createDataFrame([(0,)], "v long")
    dist, info = bfs_hops(spark, cycle5, srcs, max_hops=50)
    assert dist.count() == 5
    assert info["rounds"] <= 3  # cycle of 5: eccentricity 2 undirected


def test_harmonic_centrality_path_graph(spark):
    """Path 0-1-2-3-4, landmarks {0, 4}: h(v) = 1/d(v,0) + 1/d(v,4),
    landmark self-terms excluded."""
    from montecarlopagerank_spark.algos.bfs import harmonic_centrality

    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4)], "src long, dst long"
    )
    lmk = spark.createDataFrame([(0,), (4,)], "v long")
    h, info = harmonic_centrality(spark, e, lmk, max_hops=6)
    got = {r["v"]: r["harmonic"] for r in h.collect()}
    want = {0: 1 / 4, 1: 1 + 1 / 3, 2: 1 / 2 + 1 / 2, 3: 1 / 3 + 1, 4: 1 / 4}
    assert set(got) == set(want)
    for v, x in want.items():
        assert got[v] == pytest.approx(x, abs=1e-12), f"vertex {v}"


def test_harmonic_centrality_hop_cap_drops_far_terms(spark):
    from montecarlopagerank_spark.algos.bfs import harmonic_centrality

    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4)], "src long, dst long"
    )
    lmk = spark.createDataFrame([(0,)], "v long")
    h, _ = harmonic_centrality(spark, e, lmk, max_hops=2)
    got = {r["v"]: r["harmonic"] for r in h.collect()}
    assert got == {1: 1.0, 2: 0.5}  # 3, 4 unreached; landmark 0 absent


def test_closeness_centrality_path_graph(spark):
    """Path 0-1-2-3-4, landmarks {0, 4}: c(v) = reached / Σd, self-terms
    excluded — e.g. c(2) = 2/(2+2) = 0.5, c(0) = 1/4 (only landmark 4)."""
    from montecarlopagerank_spark.algos.bfs import closeness_centrality

    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4)], "src long, dst long"
    )
    lmk = spark.createDataFrame([(0,), (4,)], "v long")
    c, info = closeness_centrality(spark, e, lmk, max_hops=6)
    got = {r["v"]: (r["closeness"], r["reached"]) for r in c.collect()}
    want = {
        0: (1 / 4, 1),
        1: (2 / (1 + 3), 2),
        2: (2 / (2 + 2), 2),
        3: (2 / (3 + 1), 2),
        4: (1 / 4, 1),
    }
    assert set(got) == set(want)
    for v, (x, r) in want.items():
        assert got[v][0] == pytest.approx(x, abs=1e-12), f"vertex {v}"
        assert got[v][1] == r, f"vertex {v} reached"


def test_closeness_centrality_hop_cap_and_disconnection(spark):
    """Hop cap truncates the landmark set per vertex (the reached column
    says by how much); a vertex reaching no landmark is absent."""
    from montecarlopagerank_spark.algos.bfs import closeness_centrality

    # path 0-1-2-3-4 plus isolated pair 10-11
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11)], "src long, dst long"
    )
    lmk = spark.createDataFrame([(0,)], "v long")
    c, _ = closeness_centrality(spark, e, lmk, max_hops=2)
    got = {r["v"]: (r["closeness"], r["reached"]) for r in c.collect()}
    assert got == {1: (1.0, 1), 2: (0.5, 1)}  # 3,4 capped; 10,11 absent


# ---------------------------------------------------------------------
# SALSA
# ---------------------------------------------------------------------

def _salsa_numpy(pairs, iters):
    n = max(max(a, b) for a, b in pairs) + 1
    outdeg = np.zeros(n)
    indeg = np.zeros(n)
    for a, b in pairs:
        outdeg[a] += 1
        indeg[b] += 1
    hubs = [v for v in range(n) if outdeg[v] > 0]
    h = np.zeros(n)
    h[hubs] = 1.0 / len(hubs)
    a_ = np.zeros(n)
    for _ in range(iters):
        a_ = np.zeros(n)
        for u, v in pairs:
            a_[v] += h[u] / outdeg[u]
        h = np.zeros(n)
        for u, v in pairs:
            h[u] += a_[v] / indeg[v]
    return h, a_


def test_salsa_matches_numpy_twin(spark):
    from montecarlopagerank_spark.algos.salsa import salsa

    # multigraph (duplicate edge 0->1), a sink (3), a source (4)
    pairs = [(0, 1), (0, 1), (0, 2), (1, 2), (2, 0), (4, 3), (2, 3)]
    scores, info = salsa(spark, edges_df(spark, pairs), iters=5)
    want_h, want_a = _salsa_numpy(pairs, iters=5)
    got = {r["v"]: (r["hub"], r["auth"]) for r in scores.collect()}
    assert set(got) == {0, 1, 2, 3, 4}
    for v, (hh, aa) in got.items():
        assert hh == pytest.approx(want_h[v], rel=1e-12, abs=1e-15)
        assert aa == pytest.approx(want_a[v], rel=1e-12, abs=1e-15)
    # stochastic-step invariant: every observed half-step sum is 1
    for sa, sh in info["l1_sums"]:
        assert sa == pytest.approx(1.0, abs=1e-12)
        assert sh == pytest.approx(1.0, abs=1e-12)
    # sink 3 is never a hub, source 4 never an authority
    assert got[3][0] == 0.0
    assert got[4][1] == 0.0


def test_salsa_cycle_uniform(spark, cycle5):
    """On a directed 5-cycle every vertex is hub and authority with
    score exactly 1/5 at every iteration."""
    from montecarlopagerank_spark.algos.salsa import salsa

    scores, _ = salsa(spark, cycle5, iters=3)
    for r in scores.collect():
        assert r["hub"] == pytest.approx(0.2, abs=1e-15)
        assert r["auth"] == pytest.approx(0.2, abs=1e-15)


def test_salsa_isolated_vertices_zero(spark):
    from montecarlopagerank_spark.algos.salsa import salsa

    e = edges_df(spark, [(0, 1)])
    verts = spark.createDataFrame([(0,), (1,), (9,)], "vid long")
    scores, _ = salsa(spark, e, vertices=verts, iters=2)
    got = {r["v"]: (r["hub"], r["auth"]) for r in scores.collect()}
    assert got[9] == (0.0, 0.0)
    assert got[0] == (1.0, 0.0)
    assert got[1] == (0.0, 1.0)
