"""CC / LPA / triangle exact-match tests (SURVEY.md §2.7, §5.2)."""

from __future__ import annotations

from montecarlopagerank_spark.algos.components import connected_components
from montecarlopagerank_spark.algos.labelprop import label_propagation
from montecarlopagerank_spark.algos.triangles import (
    triangle_count,
    triangles_per_vertex,
)
from tests.oracle import components_oracle, lpa_oracle, triangle_count_oracle


def as_dict(df, k="v", val=None):
    val = val or [c for c in df.columns if c != k][0]
    return {r[k]: r[val] for r in df.collect()}


def test_cc_two_triangles_bridge(spark, two_triangles_bridge):
    got = as_dict(connected_components(spark, two_triangles_bridge))
    assert got == {v: 0 for v in range(6)}  # one component, min-id label


def test_cc_without_bridge(spark):
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3)], "src long, dst long"
    )
    got = as_dict(connected_components(spark, e))
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 3}


def test_cc_vs_oracle_random(spark, gnutella_mini, gnutella_mini_pairs):
    got = as_dict(connected_components(spark, gnutella_mini))
    assert got == components_oracle(gnutella_mini_pairs)


def test_cc_isolated_vertices(spark):
    e = spark.createDataFrame([(0, 1)], "src long, dst long")
    v = spark.createDataFrame([(0,), (1,), (7,)], "vid long")
    got = as_dict(connected_components(spark, e, vertices=v))
    assert got == {0: 0, 1: 0, 7: 7}


def test_triangles_golden(spark, two_triangles_bridge):
    assert triangle_count(spark, two_triangles_bridge) == 2


def test_triangles_vs_oracle_random(spark, gnutella_mini, gnutella_mini_pairs):
    assert triangle_count(spark, gnutella_mini) == triangle_count_oracle(
        gnutella_mini_pairs
    )


def test_triangles_per_vertex(spark, two_triangles_bridge):
    got = as_dict(triangles_per_vertex(spark, two_triangles_bridge))
    assert got == {v: 1 for v in range(6)}


def test_triangles_k4(spark):
    # complete graph K4 has C(4,3)=4 triangles; each vertex in 3
    pairs = [(a, b) for a in range(4) for b in range(4) if a < b]
    e = spark.createDataFrame(pairs, "src long, dst long")
    assert triangle_count(spark, e) == 4
    got = as_dict(triangles_per_vertex(spark, e))
    assert got == {v: 3 for v in range(4)}


def test_lpa_two_cliques_bridge(spark):
    """Two 4-cliques joined by one bridge edge -> 2 labels (min id each)."""
    c1 = [(a, b) for a in range(4) for b in range(4) if a < b]
    c2 = [(a + 4, b + 4) for a, b in c1]
    e = spark.createDataFrame(c1 + c2 + [(3, 4)], "src long, dst long")
    got = as_dict(label_propagation(spark, e))
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 4, 6: 4, 7: 4}


def test_lpa_matches_oracle(spark, two_triangles_bridge):
    got = as_dict(label_propagation(spark, two_triangles_bridge, max_iters=20))
    oracle = lpa_oracle(
        [(r["src"], r["dst"]) for r in two_triangles_bridge.collect()],
        max_iters=20,
    )
    assert got == oracle


def test_lpa_vid_transcript_graph_matches_oracle(spark):
    """Long-vid LPA over the real transcript-derived graph vs the pure-
    python oracle, exactly 10 rounds. Pins the long-key LPA path now that
    the driver's hash-checked label_propagation_sizes runs on STRING keys
    (contract.py) — the two keyings produce different tie-break orders
    (vids rank turn_idx numerically, strings lexically), so each needs its
    own oracle."""
    from montecarlopagerank_spark.contract import _vid_graph

    v_edges, _vertices, _key = _vid_graph(spark, "/root/testdata/sf0.001")
    pairs = [(r["src"], r["dst"]) for r in v_edges.collect()]
    got = as_dict(label_propagation(spark, v_edges, max_iters=10))
    assert got == lpa_oracle(pairs, max_iters=10)
