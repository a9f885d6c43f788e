"""Kahn peel (algos/toposort.py): exact layers on DAGs, cycle residue,
bounded-round semantics, and a randomized python-twin equality."""

from __future__ import annotations

import random

from montecarlopagerank_spark.algos.toposort import kahn_peel
from tests.conftest import edges_df


def peel_naive(pairs, max_rounds=None):
    """Python twin: synchronous zero-in-degree peel on the simple digraph."""
    edges = set(pairs)
    verts = {v for e in edges for v in e}
    out: dict[int, int] = {}
    r = 0
    while max_rounds is None or r < max_rounds:
        dsts = {d for _, d in edges}
        peel = {v for v in verts if v not in dsts}
        if not peel:
            break
        for v in peel:
            out[v] = r
        verts -= peel
        edges = {(s, d) for s, d in edges if s in verts}
        r += 1
    for v in verts:
        out[v] = -1
    return out


def run(spark, pairs, **kw):
    out, info = kahn_peel(spark, edges_df(spark, pairs), **kw)
    return {r.v: r.layer for r in out.collect()}, info


def test_chain_layers(spark):
    got, info = run(spark, [(0, 1), (1, 2), (2, 3)])
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}
    assert info["converged"] and info["n_unresolved"] == 0


def test_diamond_longest_path_layering(spark):
    got, _ = run(spark, [(0, 1), (0, 2), (1, 3), (2, 3), (0, 3)])
    assert got == {0: 0, 1: 1, 2: 1, 3: 2}


def test_cycle_residue_exact(spark):
    # 0→1→2→0 cycle, 3 downstream of it, 4→5 a clean DAG beside it
    pairs = [(0, 1), (1, 2), (2, 0), (2, 3), (4, 5)]
    got, info = run(spark, pairs)
    assert got == {0: -1, 1: -1, 2: -1, 3: -1, 4: 0, 5: 1}
    assert info["converged"] and info["n_unresolved"] == 4


def test_self_loop_is_a_cycle(spark):
    got, _ = run(spark, [(7, 7), (7, 8)])
    assert got == {7: -1, 8: -1}


def test_parallel_edges_deduped(spark):
    got, _ = run(spark, [(0, 1), (0, 1), (1, 2)])
    assert got == {0: 0, 1: 1, 2: 2}


def test_bounded_rounds_mark_deep_vertices(spark):
    pairs = [(i, i + 1) for i in range(5)]
    got, info = run(spark, pairs, max_rounds=2)
    assert got == {0: 0, 1: 1, 2: -1, 3: -1, 4: -1, 5: -1}
    assert not info["converged"]
    assert got == peel_naive(pairs, max_rounds=2)


def test_randomized_vs_python_twin(spark):
    rng = random.Random(47)
    pairs = list(
        {(rng.randint(0, 25), rng.randint(0, 25)) for _ in range(60)}
    )
    got, info = run(spark, pairs)
    assert got == peel_naive(pairs)
    assert info["converged"]
