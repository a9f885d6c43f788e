"""Tests: H-index core-number decomposition (algos/corenum.py) — exact
equality against classic sequential peeling, fixtures, and consistency
with the fixed-k k-core filter."""

from __future__ import annotations

from pyspark.sql import functions as F

from montecarlopagerank_spark.algos.corenum import core_numbers
from montecarlopagerank_spark.algos.kcore import k_core
from tests.oracle import random_powerlaw_digraph


def coreness_py(edge_list):
    """Exact coreness by sequential min-degree peeling (Batagelj-
    Zaversnik semantics on the undirected simple closure)."""
    und = {(min(a, b), max(a, b)) for a, b in edge_list if a != b}
    nbrs: dict = {}
    verts = {v for e in edge_list for v in e}
    for x, y in und:
        nbrs.setdefault(x, set()).add(y)
        nbrs.setdefault(y, set()).add(x)
    deg = {v: len(nbrs.get(v, ())) for v in verts}
    core = {}
    live = set(verts)
    while live:
        v = min(live, key=lambda x: (deg[x], str(x)))
        core[v] = deg[v] if not core else max(deg[v], max(core.values()))
        # classic: core(v) = max(deg at removal, best seen so far)
        live.discard(v)
        for w in nbrs.get(v, ()):
            if w in live:
                deg[w] -= 1
    return core


def _cmap(df):
    return {r["v"]: r["coreness"] for r in df.collect()}


def test_matches_peeling_on_random_graph(spark):
    el = random_powerlaw_digraph(n=80, seed=17)
    df = spark.createDataFrame(el, "src long, dst long")
    out, info = core_numbers(spark, df)
    assert info["converged"]
    assert _cmap(out) == coreness_py(el)


def test_fixtures(spark):
    # 4-clique (coreness 3) + pendant chain (coreness 1) + isolated self-loop
    cl = [(a, b) for a in range(4) for b in range(4) if a < b]
    e = spark.createDataFrame(
        cl + [(3, 4), (4, 5), (9, 9)], "src long, dst long"
    )
    out, info = core_numbers(spark, e)
    got = _cmap(out)
    assert all(got[v] == 3 for v in range(4))
    assert got[4] == 1 and got[5] == 1 and got[9] == 0
    assert info["max_coreness"] == 3


def test_consistent_with_k_core(spark):
    el = random_powerlaw_digraph(n=60, seed=23)
    df = spark.createDataFrame(el, "src long, dst long")
    cores = _cmap(core_numbers(spark, df)[0])
    for k in (1, 2, 3):
        in_kcore = {r["v"] for r in k_core(spark, df, k=k)[0].collect()}
        assert in_kcore == {v for v, c in cores.items() if c >= k}, k


def test_empty_input(spark):
    empty = spark.createDataFrame([], "src string, dst string")
    out, info = core_numbers(spark, empty)
    assert out.count() == 0 and info["max_coreness"] == 0
