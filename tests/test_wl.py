"""1-WL refinement (algos/wl.py): structural-equivalence classes on
known graphs, python-twin equality, and parallelism invariance of the
order-insensitive multiset summaries."""

from __future__ import annotations

import hashlib
import random

from montecarlopagerank_spark.algos.wl import wl_colors
from tests.conftest import edges_df


def wl_naive(pairs, rounds):
    """Python twin: same hashes, same multiset summaries."""
    d = {(s, t) for s, t in pairs}
    verts = {v for e in d for v in e}
    od = {v: 0 for v in verts}
    ind = {v: 0 for v in verts}
    for s, t in d:
        od[s] += 1
        ind[t] += 1
    md5 = lambda x: hashlib.md5(x.encode()).hexdigest()  # noqa: E731
    h = lambda c: int(md5(c)[:8], 16)  # noqa: E731
    color = {v: md5(f"{od[v]}|{ind[v]}") for v in verts}
    for _ in range(rounds):
        osum = {v: 0 for v in verts}
        oc = {v: 0 for v in verts}
        isum = {v: 0 for v in verts}
        ic = {v: 0 for v in verts}
        for s, t in d:
            osum[s] += h(color[t])
            oc[s] += 1
            isum[t] += h(color[s])
            ic[t] += 1
        color = {
            v: md5(f"{color[v]}|{osum[v]}|{oc[v]}|{isum[v]}|{ic[v]}")
            for v in verts
        }
    return color


def run(spark, pairs, rounds=3):
    out, info = wl_colors(spark, edges_df(spark, pairs), rounds=rounds)
    return {r.v: r.color for r in out.collect()}, info


def classes(colors):
    by: dict = {}
    for v, c in colors.items():
        by.setdefault(c, set()).add(v)
    return {frozenset(s) for s in by.values()}


def test_cycle_vertices_indistinguishable(spark):
    got, info = run(spark, [(i, (i + 1) % 6) for i in range(6)])
    assert len(set(got.values())) == 1  # vertex-transitive graph
    assert info["n_colors"] == 1 and info["stable"]


def test_star_distinguishes_hub_from_leaves(spark):
    got, info = run(spark, [(0, i) for i in range(1, 6)])
    assert classes(got) == {frozenset({0}), frozenset(range(1, 6))}
    assert info["n_colors"] == 2


def test_matches_python_twin_exactly(spark):
    rng = random.Random(79)
    pairs = list({(rng.randint(0, 18), rng.randint(0, 18)) for _ in range(70)})
    # engine vertex keys are longs; twin uses str(v) for hashing parity
    got, _ = run(spark, pairs)
    want = wl_naive([(str(s), str(t)) for s, t in pairs], 3)
    assert {str(v): c for v, c in got.items()} == want


def test_path_endpoints_vs_middle(spark):
    # directed path a→b→c→d: all four distinguishable by round 2
    got, _ = run(spark, [(0, 1), (1, 2), (2, 3)], rounds=2)
    assert len(set(got.values())) == 4
