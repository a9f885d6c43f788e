"""Unit tests for weighted single/multi-source shortest paths
(algos/sssp.py). Exact closed-form expectations on tiny graphs + a
numpy Bellman-Ford twin on the power-law fixture."""

from __future__ import annotations

import numpy as np

from montecarlopagerank_spark.algos.sssp import sssp
from tests.conftest import edges_df


def wedges_df(spark, triples):
    return spark.createDataFrame(
        [(int(a), int(b), int(w)) for a, b, w in triples],
        "src long, dst long, w long",
    )


def test_sssp_prefers_light_long_path(spark):
    # 0→1→2 with weights 1+1=2 beats the direct 0→2 edge of weight 5,
    # so min-weight differs from min-hop — the thing bfs_hops can't do.
    e = wedges_df(spark, [(0, 1, 1), (1, 2, 1), (0, 2, 5)])
    srcs = spark.createDataFrame([(0,)], "v long")
    dist, info = sssp(spark, e, srcs)
    got = {r["v"]: r["d"] for r in dist.collect()}
    assert got == {0: 0, 1: 1, 2: 2}
    assert info["converged"]


def test_sssp_multigraph_takes_min_parallel_edge(spark):
    e = wedges_df(spark, [(0, 1, 7), (0, 1, 3), (1, 0, 9)])
    srcs = spark.createDataFrame([(0,)], "v long")
    dist, _ = sssp(spark, e, srcs)
    got = {r["v"]: r["d"] for r in dist.collect()}
    assert got == {0: 0, 1: 3}


def test_sssp_directed_respects_orientation(spark):
    e = wedges_df(spark, [(1, 0, 2), (0, 2, 4)])
    srcs = spark.createDataFrame([(0,)], "v long")
    und = {r["v"]: r["d"] for r in sssp(spark, e, srcs)[0].collect()}
    dird = {
        r["v"]: r["d"] for r in sssp(spark, e, srcs, directed=True)[0].collect()
    }
    assert und == {0: 0, 1: 2, 2: 4}
    assert dird == {0: 0, 2: 4}  # 1→0 not traversable from 0


def test_sssp_multi_source_takes_nearest(spark):
    # path 0-1-2-3-4 with unit weights, sources {0, 4}
    e = wedges_df(spark, [(i, i + 1, 1) for i in range(4)])
    srcs = spark.createDataFrame([(0,), (4,)], "v long")
    dist, info = sssp(spark, e, srcs)
    got = {r["v"]: r["d"] for r in dist.collect()}
    assert got == {0: 0, 4: 0, 1: 1, 3: 1, 2: 2}
    assert info["converged"]


def test_sssp_unreachable_absent_and_self_loop_ignored(spark):
    e = wedges_df(spark, [(0, 1, 2), (0, 0, 1), (5, 6, 1)])
    srcs = spark.createDataFrame([(0,)], "v long")
    dist, _ = sssp(spark, e, srcs)
    got = {r["v"]: r["d"] for r in dist.collect()}
    assert got == {0: 0, 1: 2}  # 5, 6 unreachable → absent


def test_sssp_max_rounds_caps_and_reports(spark):
    # path of 6 edges, cap at 2 relaxation rounds → only 2 hops out
    e = wedges_df(spark, [(i, i + 1, 1) for i in range(6)])
    srcs = spark.createDataFrame([(0,)], "v long")
    dist, info = sssp(spark, e, srcs, max_rounds=2)
    got = {r["v"]: r["d"] for r in dist.collect()}
    assert got == {0: 0, 1: 1, 2: 2}
    assert not info["converged"]


def _sssp_numpy(triples, src_ids, directed=False):
    best: dict[int, int] = {int(s): 0 for s in src_ids}
    adj: dict[int, list[tuple[int, int]]] = {}
    for a, b, w in triples:
        if a == b:
            continue
        adj.setdefault(a, []).append((b, w))
        if not directed:
            adj.setdefault(b, []).append((a, w))
    changed = True
    while changed:
        changed = False
        for u, d in list(best.items()):
            for x, w in adj.get(u, []):
                if x not in best or d + w < best[x]:
                    best[x] = d + w
                    changed = True
    return best


def test_sssp_matches_numpy_on_power_law_fixture(spark, gnutella_mini_pairs):
    rng = np.random.default_rng(7)
    triples = [
        (int(a), int(b), int(rng.integers(1, 10)))
        for a, b in gnutella_mini_pairs
    ]
    e = wedges_df(spark, triples)
    srcs = spark.createDataFrame([(0,), (3,)], "v long")
    dist, info = sssp(spark, e, srcs, max_rounds=64)
    got = {r["v"]: r["d"] for r in dist.collect()}
    assert got == _sssp_numpy(triples, [0, 3])
    assert info["converged"]
