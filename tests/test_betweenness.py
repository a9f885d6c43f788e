"""Unit tests for landmark betweenness (algos/betweenness.py): exact
closed forms on tiny graphs + a pure-Python hop-capped Brandes oracle
on the power-law fixture."""

from __future__ import annotations

from collections import deque

import pytest

from montecarlopagerank_spark.algos.betweenness import landmark_betweenness
from tests.conftest import edges_df


def _brandes(pairs, sources, max_hops, directed=False):
    """Hop-capped Brandes dependency accumulation (Brandes 2001 alg. 1),
    summed over the given sources. Simple-graph closure."""
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        if not directed:
            adj.setdefault(b, set()).add(a)
    bc: dict[int, float] = {}
    for s in sources:
        dist = {s: 0}
        sigma = {s: 1.0}
        order = [s]
        preds: dict[int, list[int]] = {s: []}
        q = deque([s])
        while q:
            u = q.popleft()
            if dist[u] >= max_hops:
                continue
            for w in sorted(adj.get(u, ())):
                if w not in dist:
                    dist[w] = dist[u] + 1
                    sigma[w] = 0.0
                    preds[w] = []
                    order.append(w)
                    q.append(w)
                if dist[w] == dist[u] + 1:
                    sigma[w] += sigma[u]
                    preds[w].append(u)
        delta = {v: 0.0 for v in order}
        for w in reversed(order):
            for v in preds[w]:
                delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            if w != s:
                bc[w] = bc.get(w, 0.0) + delta[w]
    return bc


def srcs_df(spark, vs):
    return spark.createDataFrame([(int(v),) for v in vs], "v long")


def _collect(bc_df):
    return {r["v"]: r["btw"] for r in bc_df.collect()}


def test_path_graph_single_landmark(spark):
    # path 0-1-2-3, landmark {0}: delta(1)=2 (paths to 2,3 pass), delta(2)=1
    e = edges_df(spark, [(0, 1), (1, 2), (2, 3)])
    bc, info = landmark_betweenness(spark, e, srcs_df(spark, [0]), max_hops=6)
    got = _collect(bc)
    assert got == pytest.approx({1: 2.0, 2: 1.0, 3: 0.0})
    assert info["max_depth"] == 3


def test_diamond_splits_sigma(spark):
    # 0→{1,2}→3: two shortest 0-3 paths, each middle vertex gets 0.5
    e = edges_df(spark, [(0, 1), (0, 2), (1, 3), (2, 3)])
    bc, _ = landmark_betweenness(spark, e, srcs_df(spark, [0]), max_hops=6)
    assert _collect(bc) == pytest.approx({1: 0.5, 2: 0.5, 3: 0.0})


def test_hop_cap_truncates(spark):
    e = edges_df(spark, [(i, i + 1) for i in range(5)])  # path of 6
    bc, info = landmark_betweenness(spark, e, srcs_df(spark, [0]), max_hops=2)
    # only vertices 1, 2 discovered; paths to 2 pass through 1
    assert _collect(bc) == pytest.approx({1: 1.0, 2: 0.0})
    assert info["max_depth"] == 2


def test_multi_landmark_sums(spark):
    pairs = [(0, 1), (1, 2), (2, 3)]
    e = edges_df(spark, pairs)
    bc, _ = landmark_betweenness(spark, e, srcs_df(spark, [0, 3]), max_hops=6)
    want = _brandes(pairs, [0, 3], 6)
    got = _collect(bc)
    for v, x in want.items():
        assert got[v] == pytest.approx(x)


def test_directed_orientation(spark):
    pairs = [(0, 1), (1, 2), (2, 0)]
    e = edges_df(spark, pairs)
    bc, _ = landmark_betweenness(
        spark, e, srcs_df(spark, [0]), max_hops=6, directed=True
    )
    want = _brandes(pairs, [0], 6, directed=True)
    got = _collect(bc)
    for v, x in want.items():
        assert got[v] == pytest.approx(x)


def test_matches_brandes_on_power_law(spark, gnutella_mini_pairs, gnutella_mini):
    landmarks = [0, 3, 7]
    bc, _ = landmark_betweenness(
        spark, gnutella_mini, srcs_df(spark, landmarks), max_hops=6
    )
    want = _brandes(gnutella_mini_pairs, landmarks, 6)
    got = _collect(bc)
    assert set(got) == set(want)
    for v, x in want.items():
        assert got[v] == pytest.approx(x, rel=1e-9), v
