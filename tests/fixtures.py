"""Golden micro-graphs (FIXTURES.md §3) as undirected edge-pair lists."""

from __future__ import annotations

import itertools

TRIANGLE = [(0, 1), (1, 2), (0, 2)]
PATH4 = [(0, 1), (1, 2), (2, 3)]
STAR10 = [(0, i) for i in range(1, 11)]
K5 = list(itertools.combinations(range(5), 2))
TWO_K4 = list(itertools.combinations(range(4), 2)) + [
    (a + 4, b + 4) for a, b in itertools.combinations(range(4), 2)
]
BIPARTITE33 = [(i, j) for i in range(3) for j in range(3, 6)]

GOLDEN_TC = {
    "triangle": (TRIANGLE, 1),
    "path4": (PATH4, 0),
    "star10": (STAR10, 0),
    "k5": (K5, 10),
    "two_k4": (TWO_K4, 8),
    "bipartite33": (BIPARTITE33, 0),
}


def er_graph(n: int, p_inv: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic Erdős–Rényi graph: edge {u,v} kept with prob 1/p_inv
    under a seeded Mersenne Twister (stable across runs and platforms)."""
    import random

    rng = random.Random(seed)
    pairs = []
    for u in range(n):
        for v in range(u + 1, n):
            if rng.random() * p_inv < 1.0:
                pairs.append((u, v))
    return pairs
