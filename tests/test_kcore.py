"""k-core peeling tests (new-engine scope, SURVEY.md §2.7)."""

from __future__ import annotations

from collections import defaultdict

from montecarlopagerank_spark.algos.kcore import k_core


def kcore_oracle(pairs, k):
    """Brute-force synchronous peel over undirected simple pairs."""
    adj = defaultdict(set)
    for s, d in pairs:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    while True:
        dead = [v for v, n in adj.items() if len(n) < k]
        if not dead:
            break
        for v in dead:
            for w in adj[v]:
                adj[w].discard(v)
            del adj[v]
    return {v: len(n) for v, n in adj.items()}


def as_dict(df):
    return {r["v"]: r["deg"] for r in df.collect()}


def test_kcore_triangle_with_pendant_path(spark):
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)], "src long, dst long"
    )
    core, info = k_core(spark, e, k=2)
    assert info["converged"]
    assert as_dict(core) == {0: 2, 1: 2, 2: 2}
    core3, info3 = k_core(spark, e, k=3)
    assert info3["converged"]
    assert as_dict(core3) == {}


def test_kcore_k4_with_tail(spark):
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    e = spark.createDataFrame(k4 + [(3, 4), (4, 5)], "src long, dst long")
    core, info = k_core(spark, e, k=3)
    assert info["converged"]
    assert as_dict(core) == {0: 3, 1: 3, 2: 3, 3: 3}


def test_kcore_k1_is_all_endpoints_and_dups_ignored(spark):
    # duplicate + reversed edges and self-loops must not inflate degrees
    e = spark.createDataFrame(
        [(0, 1), (1, 0), (0, 1), (2, 2)], "src long, dst long"
    )
    core, info = k_core(spark, e, k=1)
    assert info["converged"]
    assert as_dict(core) == {0: 1, 1: 1}
    assert as_dict(k_core(spark, e, k=2)[0]) == {}


def test_kcore_empty_edges(spark):
    e = spark.createDataFrame([], "src long, dst long")
    core, info = k_core(spark, e, k=2)
    assert info["converged"] and info["rounds"] == 0
    assert core.count() == 0
    assert [f.name for f in core.schema.fields] == ["v", "deg"]


def test_kcore_vs_oracle_random(spark, gnutella_mini, gnutella_mini_pairs):
    for k in (2, 3):
        core, info = k_core(spark, gnutella_mini, k=k)
        assert info["converged"]
        assert as_dict(core) == kcore_oracle(gnutella_mini_pairs, k)
