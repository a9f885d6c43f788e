"""Unit tests for Newman modularity (algos/modularity.py): closed-form
scores on the two-triangle fixture and degenerate partitions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from montecarlopagerank_spark.algos.modularity import conductance, modularity
from tests.conftest import edges_df


def labels_df(spark, mapping):
    return spark.createDataFrame(
        [(int(v), int(c)) for v, c in mapping.items()], "v long, label long"
    )


def _q(df):
    r = df.collect()[0]
    return r["modularity_r6"], r["m"]


def test_two_triangles_natural_partition(spark, two_triangles_bridge):
    lab = labels_df(spark, {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 1})
    q, m = _q(modularity(two_triangles_bridge, lab))
    # m=7; each triangle: e_c=3, D_c=7 → Q = 2*(3/7 - (7/14)^2)
    assert m == 7
    assert q == pytest.approx(2 * (3 / 7 - 0.25), abs=1e-6)


def test_single_community_is_zero(spark, two_triangles_bridge):
    lab = labels_df(spark, {v: 0 for v in range(6)})
    q, _ = _q(modularity(two_triangles_bridge, lab))
    assert q == pytest.approx(0.0, abs=1e-9)


def test_singletons_negative(spark, two_triangles_bridge):
    lab = labels_df(spark, {v: v for v in range(6)})
    q, _ = _q(modularity(two_triangles_bridge, lab))
    # Q = -Σ (d_v/2m)²; degrees 2,2,3,3,2,2 with m=7
    want = -sum((d / 14) ** 2 for d in (2, 2, 3, 3, 2, 2))
    assert q == pytest.approx(want, abs=1e-6)


def test_multigraph_and_self_loops_collapse(spark):
    e = edges_df(spark, [(0, 1), (0, 1), (1, 0), (0, 0), (2, 3)])
    lab = labels_df(spark, {0: 0, 1: 0, 2: 1, 3: 1})
    q, m = _q(modularity(e, lab))
    assert m == 2  # {0,1} and {2,3} once each
    # two components, each e_c=1, D_c=2: Q = 2*(1/2 - (2/4)^2) = 0.5
    assert q == pytest.approx(0.5, abs=1e-9)


def test_empty_graph(spark):
    e = edges_df(spark, [(0, 0)])  # only a self-loop → no undirected edges
    lab = labels_df(spark, {0: 0})
    q, m = _q(modularity(e, lab))
    assert (q, m) == (0.0, 0)


def _phi(df):
    return {r["label"]: (r["size"], r["phi_r6"]) for r in df.collect()}


def test_conductance_two_triangles(spark, two_triangles_bridge):
    lab = labels_df(spark, {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 1})
    got = _phi(conductance(two_triangles_bridge, lab))
    # each side: cut=1 (the bridge), vol=7, rest=7 → φ = 1/7
    assert got == {
        0: (3, pytest.approx(round(1 / 7, 6))),
        1: (3, pytest.approx(round(1 / 7, 6))),
    }


def test_conductance_whole_graph_zero(spark, two_triangles_bridge):
    lab = labels_df(spark, {v: 0 for v in range(6)})
    got = _phi(conductance(two_triangles_bridge, lab))
    assert got == {0: (6, 0.0)}


def test_conductance_singleton_is_one(spark, two_triangles_bridge):
    # {0} vs rest: vertex 0 has degree 2, both edges cut → φ = 2/2 = 1
    lab = labels_df(spark, {0: 1, 1: 0, 2: 0, 3: 0, 4: 0, 5: 0})
    got = _phi(conductance(two_triangles_bridge, lab))
    assert got[1] == (1, 1.0)


def test_approx_percentile_tracks_exact(spark):
    import numpy as np

    rng = np.random.default_rng(5)
    vals = np.concatenate(
        [rng.zipf(2.0, 5000).clip(max=10000), np.zeros(1000)]
    ).astype(int)
    df = spark.createDataFrame([(int(x),) for x in vals], "od long")
    ps = [0.5, 0.9, 0.99, 0.999]
    arr = F.array(*[F.lit(p) for p in ps])
    exact = df.agg(F.percentile("od", arr)).collect()[0][0]
    approx = df.agg(F.approx_percentile("od", arr, 10000)).collect()[0][0]
    for e_, a_ in zip(exact, approx):
        assert abs(a_ - e_) <= max(1.0, 0.01 * e_)
