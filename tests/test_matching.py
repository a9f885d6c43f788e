"""Maximal matching: exact parity with a sequential greedy twin over the
md5 priority order, plus validity/maximality properties on random graphs."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from montecarlopagerank_spark.algos.matching import maximal_matching
from tests.conftest import edges_df


def _pri(x, y):
    key = f"{x}#{y}"
    return hashlib.md5(key.encode()).hexdigest() + "|" + key


def _greedy(pairs):
    """Sequential greedy over canonical pairs sorted by the SAME priority
    — the fixpoint the locally-minimal-edge rounds compute."""
    canon = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    matched_v, out = set(), set()
    for x, y in sorted(canon, key=lambda e: _pri(*e)):
        if x not in matched_v and y not in matched_v:
            out.add((x, y))
            matched_v.update((x, y))
    return out


def _rand_pairs(seed, n, m):
    rng = np.random.default_rng(seed)
    return [tuple(map(int, rng.integers(0, n, 2))) for _ in range(m)]


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_matching_equals_greedy_twin(spark, seed):
    pairs = _rand_pairs(seed, n=60, m=150)
    got_df, info = maximal_matching(spark, edges_df(spark, pairs))
    got = {(r["x"], r["y"]) for r in got_df.collect()}
    assert info["converged"]
    assert got == _greedy(pairs)


def test_matching_valid_and_maximal(spark):
    pairs = _rand_pairs(9, n=80, m=300)
    got_df, info = maximal_matching(spark, edges_df(spark, pairs))
    rows = got_df.collect()
    vs = [v for r in rows for v in (r["x"], r["y"])]
    assert len(vs) == len(set(vs))  # a matching: no vertex twice
    matched = set(vs)
    canon = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    for x, y in canon:  # maximal: every edge touches a matched vertex
        assert x in matched or y in matched


def test_matching_path3_and_empty(spark):
    # path 0-1-2: exactly one edge matched
    got, info = maximal_matching(spark, edges_df(spark, [(0, 1), (1, 2)]))
    assert got.count() == 1 and info["n_matched"] == 1
    # self-loops only: empty matching, converged round 0
    got, info = maximal_matching(spark, edges_df(spark, [(5, 5)]))
    assert got.count() == 0 and info["converged"]
