"""k-truss peeling tests (algos/truss.py, new-engine scope)."""

from __future__ import annotations

from itertools import combinations

from montecarlopagerank_spark.algos.truss import k_truss


def truss_oracle(pairs, k):
    """Brute-force synchronous support peel over undirected simple pairs."""
    edges = {tuple(sorted((s, d))) for s, d in pairs if s != d}
    if k <= 2:
        return edges
    while True:
        adj = {}
        for x, y in edges:
            adj.setdefault(x, set()).add(y)
            adj.setdefault(y, set()).add(x)
        sup = {e: len(adj[e[0]] & adj[e[1]]) for e in edges}
        dead = {e for e, s in sup.items() if s < k - 2}
        if not dead:
            return edges
        edges -= dead


def as_set(df):
    return {(r.x, r.y) for r in df.collect()}


def test_truss_two_triangles_bridge(spark, two_triangles_bridge):
    t3, info = k_truss(spark, two_triangles_bridge, k=3)
    assert as_set(t3) == {(0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5)}
    assert info["converged"]
    t4, _ = k_truss(spark, two_triangles_bridge, k=4)
    assert as_set(t4) == set()


def test_truss_k4_needs_shared_triangles(spark):
    # K4 is a 4-truss (every edge in 2 triangles); K4 minus one edge is not
    k4 = [(a, b) for a, b in combinations(range(4), 2)]
    df = spark.createDataFrame(k4, "src long, dst long")
    t4, _ = k_truss(spark, df, k=4)
    assert as_set(t4) == set(k4)
    df2 = spark.createDataFrame(k4[:-1], "src long, dst long")
    t42, _ = k_truss(spark, df2, k=4)
    assert as_set(t42) == set()
    # but K4-minus-an-edge still has a 3-truss (all its edges lie in a tri)
    t32, _ = k_truss(spark, df2, k=3)
    assert as_set(t32) == truss_oracle(k4[:-1], 3)


def test_truss_cascading_peel(spark):
    # a triangle strip: (0,1,2),(1,2,3),(2,3,4) — 4-truss peels outer
    # triangles first, then the middle collapses (multi-round cascade)
    strip = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3), (2, 4), (3, 4)]
    df = spark.createDataFrame(strip, "src long, dst long")
    out, info = k_truss(spark, df, k=4)
    assert as_set(out) == truss_oracle(strip, 4)
    assert info["converged"]


def test_truss_k2_is_whole_closure_and_validates(spark, two_triangles_bridge):
    t2, info = k_truss(spark, two_triangles_bridge, k=2)
    assert as_set(t2) == truss_oracle(
        [(r.src, r.dst) for r in two_triangles_bridge.collect()], 2
    )
    assert info["rounds"] == 0 and info["converged"]


def test_truss_matches_oracle_random(spark, gnutella_mini_pairs, gnutella_mini):
    for k in (3, 4):
        got, info = k_truss(spark, gnutella_mini, k=k)
        assert as_set(got) == truss_oracle(gnutella_mini_pairs, k)
        assert info["converged"]


def test_truss_sf001_depth_within_oracle_unroll(spark):
    """The contract oracle unrolls 8 rounds (_truss_sql(3, 8)); pin that
    the engine's peel depth on driver-shaped data stays below it."""
    from montecarlopagerank_spark.contract import _string_edges

    se = _string_edges(spark, "/root/testdata/sf0.001")
    _, info = k_truss(spark, se, k=3)
    assert info["converged"] and info["rounds"] <= 8


def test_four_clique_count_vs_bruteforce(spark):
    import itertools
    import random

    from montecarlopagerank_spark.algos.triangles import four_clique_count
    from tests.conftest import edges_df

    rng = random.Random(89)
    pairs = list({(rng.randint(0, 14), rng.randint(0, 14)) for _ in range(70)})
    und = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    verts = sorted({v for e in und for v in e})
    want = sum(
        1
        for q in itertools.combinations(verts, 4)
        if all((min(a, b), max(a, b)) in und for a, b in itertools.combinations(q, 2))
    )
    got = four_clique_count(spark, edges_df(spark, pairs))
    assert got == want and want > 0


def test_four_clique_known_graphs(spark):
    import itertools

    from montecarlopagerank_spark.algos.triangles import four_clique_count
    from tests.conftest import edges_df

    k5 = list(itertools.combinations(range(5), 2))
    assert four_clique_count(spark, edges_df(spark, k5)) == 5  # C(5,4)
    cyc = [(i, (i + 1) % 6) for i in range(6)]
    assert four_clique_count(spark, edges_df(spark, cyc)) == 0
