"""SCC (trim + coloring) tests — exact match vs iterative Tarjan."""

from __future__ import annotations

from collections import defaultdict

from montecarlopagerank_spark.algos.scc import strongly_connected_components


def tarjan_scc(pairs):
    """Iterative Tarjan; returns {v: max vid of v's SCC} (the engine's
    deterministic label choice)."""
    adj = defaultdict(list)
    verts = set()
    for s, d in pairs:
        adj[s].append(d)
        verts.add(s)
        verts.add(d)
    index = {}
    low = {}
    on_stack = set()
    stack = []
    comp = {}
    counter = [0]

    def strongconnect(root):
        work = [(root, iter(adj[root]))]
        index[root] = low[root] = counter[0]
        counter[0] += 1
        stack.append(root)
        on_stack.add(root)
        while work:
            v, it = work[-1]
            advanced = False
            for w in it:
                if w not in index:
                    index[w] = low[w] = counter[0]
                    counter[0] += 1
                    stack.append(w)
                    on_stack.add(w)
                    work.append((w, iter(adj[w])))
                    advanced = True
                    break
                elif w in on_stack:
                    low[v] = min(low[v], index[w])
            if advanced:
                continue
            work.pop()
            if work:
                pv = work[-1][0]
                low[pv] = min(low[pv], low[v])
            if low[v] == index[v]:
                members = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    members.append(w)
                    if w == v:
                        break
                label = max(members)
                for w in members:
                    comp[w] = label

    for v in sorted(verts):
        if v not in index:
            strongconnect(v)
    return comp


def as_dict(df):
    return {r["v"]: r["scc"] for r in df.collect()}


def test_scc_two_cycles_and_chain(spark):
    # cycle {0,1,2}, cycle {5,6}, chain 2->3->4->5, sink 7 from 6
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (5, 6), (6, 5), (6, 7)],
        "src long, dst long",
    )
    got, info = strongly_connected_components(spark, e)
    assert info["converged"]
    assert as_dict(got) == {0: 2, 1: 2, 2: 2, 3: 3, 4: 4, 5: 6, 6: 6, 7: 7}


def test_scc_dag_all_singletons(spark):
    e = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 3), (2, 3)], "src long, dst long"
    )
    got, info = strongly_connected_components(spark, e)
    assert info["converged"]
    assert as_dict(got) == {0: 0, 1: 1, 2: 2, 3: 3}


def test_scc_one_big_cycle(spark):
    n = 7
    e = spark.createDataFrame(
        [(i, (i + 1) % n) for i in range(n)], "src long, dst long"
    )
    got, info = strongly_connected_components(spark, e)
    assert info["converged"]
    assert as_dict(got) == {i: n - 1 for i in range(n)}


def test_scc_isolated_vertices_and_self_loops(spark):
    e = spark.createDataFrame([(0, 1), (1, 0), (2, 2)], "src long, dst long")
    v = spark.createDataFrame([(0,), (1,), (2,), (9,)], "vid long")
    got, info = strongly_connected_components(spark, e, vertices=v)
    assert info["converged"]
    assert as_dict(got) == {0: 1, 1: 1, 2: 2, 9: 9}


def test_scc_vs_tarjan_random(spark, gnutella_mini, gnutella_mini_pairs):
    got, info = strongly_connected_components(spark, gnutella_mini)
    assert info["converged"]
    want = tarjan_scc(gnutella_mini_pairs)
    assert as_dict(got) == want
