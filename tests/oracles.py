"""Pure-numpy oracles (FIXTURES.md §5) — independent implementations the
Spark kernels are checked against, mirroring the reference's de-facto
"all 17 variants agree" strategy (SURVEY §5) with an independent baseline.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np


def _adj(pairs: list[tuple[int, int]]) -> dict[int, set[int]]:
    adj = defaultdict(set)
    for u, v in pairs:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    return adj


def tc_oracle(pairs) -> tuple[int, dict[int, int]]:
    """Exact global + per-vertex triangle counts (i<j<k orientation)."""
    adj = _adj(pairs)
    per = Counter()
    total = 0
    for u in adj:
        for v in adj[u]:
            if v <= u:
                continue
            common = adj[u] & adj[v]
            for w in common:
                if w > v:
                    total += 1
                    per[u] += 1
                    per[v] += 1
                    per[w] += 1
    return total, dict(per)


def pagerank_oracle(
    pairs_directed, n: int, d: float = 0.85, tol: float = 1e-6, max_iter: int = 100
) -> np.ndarray:
    """Dense power iteration; dangling mass redistributed uniformly.
    ``pairs_directed``: (src, dst) directed edges over vertices 0..n-1."""
    out = defaultdict(list)
    for u, v in pairs_directed:
        out[u].append(v)
    r = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        nxt = np.zeros(n)
        dangling = 0.0
        for u in range(n):
            if out.get(u):
                share = r[u] / len(out[u])
                for v in out[u]:
                    nxt[v] += share
            else:
                dangling += r[u]
        nxt = (1.0 - d) / n + d * (nxt + dangling / n)
        if np.max(np.abs(nxt - r)) < tol:
            return nxt
        r = nxt
    return r


def cc_oracle(pairs, vertices) -> dict[int, int]:
    """Component id = min vertex id in the component (BFS)."""
    adj = _adj(pairs)
    comp = {}
    for v in sorted(vertices):
        if v in comp:
            continue
        stack, members = [v], []
        seen = {v}
        while stack:
            x = stack.pop()
            members.append(x)
            for y in adj.get(x, ()):
                if y not in seen:
                    seen.add(y)
                    stack.append(y)
        m = min(members)
        for x in members:
            comp[x] = m
    return comp


def lp_oracle(pairs, vertices, num_iter: int) -> dict[int, int]:
    """Synchronous label propagation, ties → smallest label."""
    adj = _adj(pairs)
    labels = {v: v for v in vertices}
    for _ in range(num_iter):
        nxt = {}
        for v in vertices:
            nbrs = adj.get(v)
            if not nbrs:
                nxt[v] = labels[v]
                continue
            freq = Counter(labels[u] for u in nbrs)
            best = max(freq.items(), key=lambda kv: (kv[1], -kv[0]))
            nxt[v] = best[0]
        labels = nxt
    return labels


def ppr_oracle(
    pairs_directed, n: int, sources, d: float = 0.85, tol: float = 1e-6,
    max_iter: int = 100,
) -> np.ndarray:
    """Personalized PageRank oracle: teleport (and dangling mass) to the
    uniform seed distribution."""
    out = defaultdict(list)
    for u, v in pairs_directed:
        out[u].append(v)
    e = np.zeros(n)
    for s in sources:
        e[s] = 1.0 / len(sources)
    r = e.copy()
    for _ in range(max_iter):
        nxt = np.zeros(n)
        dangling = 0.0
        for u in range(n):
            if out.get(u):
                share = r[u] / len(out[u])
                for v in out[u]:
                    nxt[v] += share
            else:
                dangling += r[u]
        nxt = (1.0 - d) * e + d * (nxt + dangling * e)
        if np.max(np.abs(nxt - r)) < tol:
            return nxt
        r = nxt
    return r


def weighted_pagerank_oracle(
    triples, n: int, d: float = 0.85, tol: float = 1e-6, max_iter: int = 100
) -> np.ndarray:
    """(src, dst, w) directed weighted edges; rank ∝ weight share."""
    out = defaultdict(list)
    for u, v, w in triples:
        out[u].append((v, w))
    r = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        nxt = np.zeros(n)
        dangling = 0.0
        for u in range(n):
            if out.get(u):
                tot = sum(w for _, w in out[u])
                for v, w in out[u]:
                    nxt[v] += r[u] * w / tot
            else:
                dangling += r[u]
        nxt = (1.0 - d) / n + d * (nxt + dangling / n)
        if np.max(np.abs(nxt - r)) < tol:
            return nxt
        r = nxt
    return r


def hits_oracle(
    pairs_directed, n: int, tol: float = 0.0, max_iter: int = 20
) -> tuple[np.ndarray, np.ndarray]:
    """Dense HITS power iteration: auth = Aᵀ·hub then L2-normalize, hub =
    A·auth then L2-normalize (Kleinberg 1999). Returns (hub, auth).
    ``tol=0`` runs exactly ``max_iter`` iterations (fixed-iteration mode)."""
    A = np.zeros((n, n))
    for u, v in pairs_directed:
        A[u, v] = 1.0
    hub = np.full(n, 1.0 / np.sqrt(n))
    auth = np.full(n, 1.0 / np.sqrt(n))
    for _ in range(max_iter):
        h0, a0 = hub.copy(), auth.copy()
        auth = A.T @ hub
        na = np.linalg.norm(auth)
        auth = auth / na if na > 0 else auth
        hub = A @ auth
        nh = np.linalg.norm(hub)
        hub = hub / nh if nh > 0 else hub
        if tol > 0 and max(np.max(np.abs(hub - h0)), np.max(np.abs(auth - a0))) < tol:
            break
    return hub, auth


def salsa_oracle(
    pairs_directed, n: int, tol: float = 0.0, max_iter: int = 20
) -> tuple[np.ndarray, np.ndarray]:
    """Dense SALSA power iteration (Lempel & Moran 2001): auth = Wᵀ·hub
    with W row-stochastic over out-links, hub = Wc·auth with Wc
    row-stochastic over in-links (transposed), each L1-normalized.
    Returns (hub, auth). ``tol=0`` runs exactly ``max_iter`` iterations."""
    A = np.zeros((n, n))
    for u, v in pairs_directed:
        A[u, v] = 1.0
    outdeg = A.sum(axis=1)
    indeg = A.sum(axis=0)
    Wr = np.divide(A, outdeg[:, None], out=np.zeros_like(A), where=outdeg[:, None] > 0)
    Wc = np.divide(A, indeg[None, :], out=np.zeros_like(A), where=indeg[None, :] > 0)
    hub = np.full(n, 1.0 / n)
    auth = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        h0, a0 = hub.copy(), auth.copy()
        auth = Wr.T @ hub
        sa = auth.sum()
        auth = auth / sa if sa > 0 else auth
        hub = Wc @ auth
        sh = hub.sum()
        hub = hub / sh if sh > 0 else hub
        if tol > 0 and max(np.max(np.abs(hub - h0)), np.max(np.abs(auth - a0))) < tol:
            break
    return hub, auth
