"""Pure NumPy / pure-Python oracles for the flagship algorithms
(SURVEY.md §5: the reference ships no tests for these, so we check
against independent dense implementations)."""

from __future__ import annotations

import numpy as np


def pagerank_oracle(edges: list[tuple[int, int]], damping=0.85, tol=1e-6, max_iter=200,
                    weights: list[float] | None = None, weighted: bool = False):
    """Dense power iteration with SimplePageRank.java:44-70 semantics:
    rank = (1-d)/N + d * A^T (rank/outdeg); dangling mass NOT redistributed."""
    ids = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    w = np.ones(len(edges)) if (weights is None or not weighted) else np.asarray(weights, float)
    out = np.zeros(n)
    for (s, d), ww in zip(edges, w):
        out[idx[s]] += ww
    r = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        msum = np.zeros(n)
        for (s, d), ww in zip(edges, w):
            msum[idx[d]] += r[idx[s]] * ww / out[idx[s]]
        nr = (1 - damping) / n + damping * msum
        delta = np.abs(nr - r).max()
        r = nr
        if delta < tol:
            break
    return {v: r[idx[v]] for v in ids}


def components_oracle(edges: list[tuple[int, int]]):
    """Union-find; component id = min vertex id (HashMin fixpoint,
    ConnectedComponents.java:42-97)."""
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in edges:
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[max(rs, rd)] = min(rs, rd)
    return {v: find(v) for v in list(parent)}


def triangle_oracle(edges: list[tuple[int, int]]):
    """Exact triangle count via adjacency sets; returns (total,
    per-max-vertex counts) matching Triangles.java:131-151 placement
    (each triangle counted once at its maximum-id vertex)."""
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj: dict[int, set[int]] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    per_max: dict[int, int] = {}
    total = 0
    for a, b in und:
        for c in adj[a] & adj[b]:
            if c > max(a, b):
                total += 1
                per_max[c] = per_max.get(c, 0) + 1
    return total, per_max


def sssp_oracle(edges: list[tuple[int, int, float]], source: int):
    """Dijkstra over the directed weighted edge list."""
    import heapq

    adj: dict[int, list[tuple[int, float]]] = {}
    nodes = set()
    for s, d, w in edges:
        adj.setdefault(s, []).append((d, w))
        nodes.update((s, d))
    dist = {source: 0.0}
    pq = [(0.0, source)]
    while pq:
        dd, u = heapq.heappop(pq)
        if dd > dist.get(u, float("inf")):
            continue
        for v, w in adj.get(u, []):
            nd = dd + w
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return dist


def kcore_oracle(edges: list[tuple[int, int]], k: int):
    """Iterative peel: surviving vertex set of the k-core."""
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj: dict[int, set[int]] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for v in list(adj):
            if len(adj[v]) < k:
                for u in adj[v]:
                    adj[u].discard(v)
                del adj[v]
                changed = True
    return set(adj)
