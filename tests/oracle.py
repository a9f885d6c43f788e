"""Pure-Python oracles (no Spark) for golden-graph tests (SURVEY.md §5.2).

PageRank oracle mirrors the reference power-iteration semantics
(PowerIterationPageRank.scala:56-142) in plain double arithmetic:
uniform init, dangling mass redistributed uniformly,
pi'_u = eps/n + (1-eps)(sum contribs_u + m/n).
"""

from __future__ import annotations

from collections import Counter, defaultdict


def pagerank_oracle(
    edges: list[tuple[int, int]],
    vertices: set[int] | None = None,
    eps: float = 0.15,
    tol: float = 1e-12,
    max_iters: int = 500,
) -> dict[int, float]:
    verts = set(vertices) if vertices is not None else set()
    out: dict[int, list[int]] = defaultdict(list)
    for s, d in edges:
        verts.add(s)
        verts.add(d)
        out[s].append(d)
    n = len(verts)
    pi = {v: 1.0 / n for v in verts}
    for _ in range(max_iters):
        contrib: dict[int, float] = defaultdict(float)
        m = 0.0
        for v, p in pi.items():
            nbrs = out.get(v)
            if not nbrs:
                m += p
            else:
                w = p / len(nbrs)
                for u in nbrs:
                    contrib[u] += w
        base = eps / n + (1.0 - eps) * m / n
        new_pi = {v: base + (1.0 - eps) * contrib.get(v, 0.0) for v in verts}
        delta = max(abs(new_pi[v] - pi[v]) for v in verts)
        pi = new_pi
        if delta < tol:
            break
    return pi


def components_oracle(
    edges: list[tuple[int, int]], vertices: set[int] | None = None
) -> dict[int, int]:
    """Union-find; label = min vertex id of the undirected component."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    verts = set(vertices) if vertices is not None else set()
    for s, d in edges:
        verts.add(s)
        verts.add(d)
    for v in verts:
        parent[v] = v
    for s, d in edges:
        union(s, d)
    return {v: find(v) for v in verts}


def triangle_count_oracle(edges: list[tuple[int, int]]) -> int:
    """Exact triangle count of the undirected closure (loops dropped)."""
    und = {(min(s, d), max(s, d)) for s, d in edges if s != d}
    adj: dict[int, set[int]] = defaultdict(set)
    for x, y in und:
        adj[x].add(y)
        adj[y].add(x)
    count = 0
    for x, y in und:
        count += len(adj[x] & adj[y] & {z for z in adj[x] if z > y})
    return count


def lpa_oracle(
    edges: list[tuple[int, int]],
    vertices: set[int] | None = None,
    max_iters: int = 20,
) -> dict[int, int]:
    """Synchronous LPA, most-frequent neighbour label, min-label tie-break —
    mirrors algos/labelprop.py semantics exactly."""
    verts = set(vertices) if vertices is not None else set()
    nbrs: dict[int, set[int]] = defaultdict(set)
    for s, d in edges:
        verts.add(s)
        verts.add(d)
        if s != d:
            nbrs[s].add(d)
            nbrs[d].add(s)
    labels = {v: v for v in verts}
    for _ in range(max_iters):
        new_labels = {}
        for v in verts:
            if not nbrs[v]:
                new_labels[v] = labels[v]
                continue
            counts = Counter(labels[u] for u in nbrs[v])
            best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
            new_labels[v] = best[0]
        if new_labels == labels:
            break
        labels = new_labels
    return labels


def random_powerlaw_digraph(
    n: int = 200, seed: int = 42
) -> list[tuple[int, int]]:
    """Deterministic power-law-ish digraph (FIXTURES.md F2 gnutella_mini):
    ~5% dangling nodes, hub in-degree >= 30. Pure-python RNG so the fixture
    is identical everywhere."""
    import random

    rng = random.Random(seed)
    edges = []
    # preferential-attachment-ish in-degree: early nodes are hubs
    for v in range(n):
        if rng.random() < 0.05:
            continue  # dangling
        out_deg = 1 + min(int(rng.paretovariate(1.3)), 20)
        for _ in range(out_deg):
            # bias destinations toward low ids -> hubs
            d = int(n * rng.random() * rng.random())
            if d != v:
                edges.append((v, d))
    return sorted(set(edges))
