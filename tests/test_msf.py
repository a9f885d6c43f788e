"""Borůvka MSF (algos/msf.py): equality with a Kruskal python twin under
the same unique priorities, forest-structure invariants, weighted and
multigraph collapse semantics."""

from __future__ import annotations

import hashlib
import random

import pytest

from montecarlopagerank_spark.algos.msf import minimum_spanning_forest
from tests.conftest import edges_df


def _md5key(x, y):
    k = f"{x}#{y}"
    return hashlib.md5(k.encode()).hexdigest() + "|" + k


def msf_naive(pairs, weights=None):
    """Kruskal twin: unique priorities = md5 key (unweighted) or
    (min-collapsed w, md5 key) lexicographic — the engine's order."""
    simple: dict[tuple, int] = {}
    for i, (s, d) in enumerate(pairs):
        if s == d:
            continue
        x, y = min(s, d), max(s, d)
        if weights is None:
            simple[(x, y)] = 0
        else:
            w = weights[i]
            simple[(x, y)] = min(simple.get((x, y), w), w)
    order = sorted(
        simple,
        key=lambda e: (
            _md5key(*e)
            if weights is None
            else (simple[e], _md5key(*e))
        ),
    )
    parent: dict = {}

    def find(a):
        while parent.get(a, a) != a:
            parent[a] = parent.get(parent[a], parent[a])
            a = parent[a]
        return a

    forest = set()
    for x, y in order:
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[rx] = ry
            forest.add((x, y))
    return forest


def run(spark, pairs, **kw):
    out, info = minimum_spanning_forest(spark, edges_df(spark, pairs), **kw)
    return {(r.x, r.y) for r in out.collect()}, info


def test_cycle_drops_exactly_one_edge(spark):
    pairs = [(i, (i + 1) % 6) for i in range(6)]
    got, info = run(spark, pairs)
    assert got == msf_naive(pairs)
    assert len(got) == 5 and info["converged"]


def test_two_components_forest_sizes(spark):
    pairs = [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 13), (13, 10)]
    got, info = run(spark, pairs)
    assert got == msf_naive(pairs)
    # V - #components = 7 - 2
    assert info["n_edges"] == 5 and info["converged"]


def test_randomized_vs_kruskal(spark):
    rng = random.Random(53)
    pairs = list({(rng.randint(0, 30), rng.randint(0, 30)) for _ in range(90)})
    got, info = run(spark, pairs)
    assert got == msf_naive(pairs)
    assert info["converged"]
    verts = {v for e in pairs for v in e if e[0] != e[1]}
    comps = len({frozenset_root(msf_naive(pairs), v) for v in verts})
    assert info["n_edges"] == len(verts) - comps


def frozenset_root(forest, v):
    """Component id of v in the forest (tiny BFS) — for the V-C check."""
    adj: dict = {}
    for x, y in forest:
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    seen, stack = {v}, [v]
    while stack:
        u = stack.pop()
        for w in adj.get(u, ()):
            if w not in seen:
                seen.add(w)
                stack.append(w)
    return min(seen)


def test_weighted_multigraph_collapses_to_min(spark):
    # parallel (0,1) edges with weights 9 and 1: pair weight is 1, so
    # (0,1) beats (1,2,w=5) in the 0-1-2 triangle closure with (0,2,w=7)
    rows = [(0, 1, 9), (1, 0, 1), (1, 2, 5), (0, 2, 7)]
    df = edges_df(spark, [(s, d) for s, d, _ in rows]).sparkSession.createDataFrame(
        rows, "src long, dst long, w long"
    )
    out, info = minimum_spanning_forest(spark, df, weight_col="w")
    got = {(r.x, r.y) for r in out.collect()}
    assert got == msf_naive(
        [(s, d) for s, d, _ in rows], weights=[w for _, _, w in rows]
    )
    assert got == {(0, 1), (1, 2)}


def test_weighted_randomized_vs_kruskal(spark):
    rng = random.Random(59)
    rows = [
        (rng.randint(0, 20), rng.randint(0, 20), rng.randint(0, 9))
        for _ in range(70)
    ]
    df = edges_df(spark, [(s, d) for s, d, _ in rows]).sparkSession.createDataFrame(
        rows, "src long, dst long, w long"
    )
    out, info = minimum_spanning_forest(spark, df, weight_col="w")
    got = {(r.x, r.y) for r in out.collect()}
    assert got == msf_naive(
        [(s, d) for s, d, _ in rows], weights=[w for _, _, w in rows]
    )
    assert info["converged"]


def test_empty_and_self_loop_only(spark):
    got, info = run(spark, [(3, 3)])
    assert got == set() and info["n_edges"] == 0 and info["converged"]


def test_weighted_fractional_not_truncated(spark):
    # w=0.5 on (0,1) must beat w=0.9 on (0,2) even though both would
    # truncate to 0 under a long cast; triangle closed by (1,2,w=2.0)
    rows = [(0, 1, 0.5), (0, 2, 0.9), (1, 2, 2.0)]
    df = spark.createDataFrame(rows, "src long, dst long, w double")
    out, info = minimum_spanning_forest(spark, df, weight_col="w")
    got = {(r.x, r.y) for r in out.collect()}
    assert got == {(0, 1), (0, 2)}  # drops the heaviest edge, not a random one
    assert info["converged"]


def test_weighted_negative_raises(spark):
    df = spark.createDataFrame(
        [(0, 1, -5.0), (1, 2, 3.0)], "src long, dst long, w double"
    )
    with pytest.raises(ValueError, match="negative weight"):
        minimum_spanning_forest(spark, df, weight_col="w")


def test_weighted_sub_nano_difference_ties_to_md5_order(spark):
    """Documented weight contract: weights differing only beyond 9
    decimals quantize EQUAL under the %030.9f priority prefix, so the
    md5 key — not the sub-1e-9 weight difference — picks the edge. Both
    candidate edges here share the same quantized weight; the result
    must be deterministic across runs and must keep exactly one of them
    (still a valid MSF at 1e-9 resolution)."""
    # (0,1) is heavier by 1e-12 — BELOW resolution; (0,2) by 1e-3 — above
    rows = [(0, 1, 1.0 + 1e-12), (0, 2, 1.0), (1, 2, 1.0 + 1e-3)]
    df = spark.createDataFrame(rows, "src long, dst long, w double")
    out1, info1 = minimum_spanning_forest(spark, df, weight_col="w")
    got1 = {(r.x, r.y) for r in out1.collect()}
    # the clearly-heavier (1,2) must be the dropped edge
    assert got1 == {(0, 1), (0, 2)}
    assert info1["converged"]
    # determinism: same input → identical forest (md5 tie-break is stable)
    out2, _ = minimum_spanning_forest(spark, df, weight_col="w")
    assert {(r.x, r.y) for r in out2.collect()} == got1
    # and a pure sub-resolution triangle: all three weights tie at 1e-9,
    # forest must still be a spanning tree (2 edges) picked by md5 order
    rows3 = [(0, 1, 2.0), (0, 2, 2.0 + 1e-13), (1, 2, 2.0 + 2e-13)]
    df3 = spark.createDataFrame(rows3, "src long, dst long, w double")
    outa, infoa = minimum_spanning_forest(spark, df3, weight_col="w")
    outb, _ = minimum_spanning_forest(spark, df3, weight_col="w")
    ga = {(r.x, r.y) for r in outa.collect()}
    gb = {(r.x, r.y) for r in outb.collect()}
    assert len(ga) == 2 and ga == gb and infoa["converged"]
