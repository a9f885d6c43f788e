"""Densest subgraph (algos/densest.py): python-twin equality of the
threshold-peeling run, planted-clique recovery, and approximation
sanity."""

from __future__ import annotations

import itertools
import random

from montecarlopagerank_spark.algos.densest import densest_subgraph
from tests.conftest import edges_df


def densest_naive(pairs, eps=0.5, max_rounds=60):
    """Python twin of the Bahmani peel (same IEEE threshold order)."""
    factor = 2.0 * (1.0 + eps)
    p = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    v = {x for e in p for x in e}
    best_d, best_r, snaps = -1.0, None, {0: set(v)}
    r = 0
    while v and r < max_rounds:
        d = len(p) / len(v)
        if d > best_d:
            best_d, best_r = d, r
        thr = factor * d
        deg: dict = {u: 0 for u in v}
        for a, b in p:
            deg[a] += 1
            deg[b] += 1
        v = {u for u in v if deg[u] > thr}
        p = {(a, b) for a, b in p if a in v and b in v}
        r += 1
        snaps[r] = set(v)
    return (snaps[best_r] if best_r is not None else set()), best_d, best_r


def run(spark, pairs, **kw):
    out, info = densest_subgraph(spark, edges_df(spark, pairs), **kw)
    return {r.v for r in out.collect()}, info


def test_planted_clique_recovered(spark):
    # a 6-clique (density 2.5) hanging off a long path (density ~1/2)
    clique = list(itertools.combinations(range(100, 106), 2))
    path = [(i, i + 1) for i in range(40)] + [(40, 100)]
    got, info = run(spark, clique + path)
    want, best_d, _ = densest_naive(clique + path)
    assert got == want
    assert set(range(100, 106)) <= got
    assert info["best_density"] == round(best_d, 9)
    assert info["converged"]


def test_randomized_vs_python_twin(spark):
    rng = random.Random(67)
    pairs = list({(rng.randint(0, 25), rng.randint(0, 25)) for _ in range(120)})
    got, info = run(spark, pairs)
    want, best_d, best_r = densest_naive(pairs)
    assert got == want
    assert info["best_round"] == best_r
    assert info["converged"]


def test_approximation_bound_on_clique_plus_noise(spark):
    # returned density must be ≥ ρ(any subgraph)/3; the 8-clique gives
    # a certificate of ρ* ≥ 3.5
    clique = list(itertools.combinations(range(8), 2))
    rng = random.Random(71)
    noise = list({(rng.randint(8, 40), rng.randint(8, 40)) for _ in range(60)})
    got, info = run(spark, clique + noise)
    assert info["best_density"] >= 3.5 / 3.0
    assert info["converged"]


def test_edge_free_graph(spark):
    got, info = run(spark, [(5, 5)])  # self-loop only → empty closure
    assert got == set()
    assert info["best_round"] is None and info["converged"]
