"""Approximate betweenness: exact-Brandes equality when pivots = all
vertices (path/star/cycle goldens + a random graph), estimator scaling,
determinism, and the empty-pivot guard."""

from collections import deque

import pytest

from pyspark.sql import functions as F

from tric_spark.operators.betweenness import betweenness_approx


def _brandes_exact(nodes, und_edges):
    """Textbook Brandes (2001) for undirected graphs, unordered pairs
    counted once (the /2 convention)."""
    adj = {v: [] for v in nodes}
    for a, b in und_edges:
        adj[a].append(b)
        adj[b].append(a)
    bc = {v: 0.0 for v in nodes}
    for s in nodes:
        stack, preds = [], {v: [] for v in nodes}
        sigma = {v: 0.0 for v in nodes}
        dist = {v: -1 for v in nodes}
        sigma[s], dist[s] = 1.0, 0
        q = deque([s])
        while q:
            v = q.popleft()
            stack.append(v)
            for w in adj[v]:
                if dist[w] < 0:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    preds[w].append(v)
        delta = {v: 0.0 for v in nodes}
        while stack:
            w = stack.pop()
            for v in preds[w]:
                delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return {v: x / 2.0 for v, x in bc.items()}


def _sym(spark, und_pairs):
    rows = [(int(a), int(b)) for a, b in und_pairs]
    rows += [(b, a) for a, b in rows]
    return spark.createDataFrame(rows, "src long, dst long")


def _vids(spark, ids):
    return spark.createDataFrame([(int(v),) for v in ids], "vid long")


def _run_exact(spark, nodes, und_pairs):
    got = {
        r.vid: r.bc
        for r in betweenness_approx(
            _sym(spark, und_pairs), _vids(spark, nodes), _vids(spark, nodes)
        ).collect()
    }
    want = _brandes_exact(list(nodes), und_pairs)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9), v
    return got


def test_path_star_cycle_goldens(spark):
    # P4: inner vertices lie on 2 pair-paths each
    got = _run_exact(spark, range(4), [(0, 1), (1, 2), (2, 3)])
    assert got[1] == pytest.approx(2.0) and got[0] == pytest.approx(0.0)
    # star K1,3: center carries all C(3,2) pairs
    got = _run_exact(spark, range(4), [(0, 1), (0, 2), (0, 3)])
    assert got[0] == pytest.approx(3.0)
    # C5: symmetric — every vertex equal
    got = _run_exact(spark, range(5), [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0)])
    assert len({round(v, 9) for v in got.values()}) == 1


def test_split_shortest_paths_and_disconnected(spark):
    # diamond 0-{1,2}-3 (two equal shortest paths) + isolated pair 8-9
    pairs = [(0, 1), (0, 2), (1, 3), (2, 3), (8, 9)]
    got = _run_exact(spark, [0, 1, 2, 3, 8, 9], pairs)
    assert got[1] == pytest.approx(0.5) and got[2] == pytest.approx(0.5)
    assert got[8] == pytest.approx(0.0)


def test_random_graph_matches_exact_brandes(spark):
    import random

    rng = random.Random(13)
    n = 24
    pairs = sorted({tuple(sorted(rng.sample(range(n), 2))) for _ in range(40)})
    _run_exact(spark, range(n), pairs)


def test_pivot_subset_scales_and_is_deterministic(spark):
    # P4 with pivots {0, 3}: δ contributions from the two end sources,
    # scaled by n/k = 2 and halved → hand-computable
    e = _sym(spark, [(0, 1), (1, 2), (2, 3)])
    verts, piv = _vids(spark, range(4)), _vids(spark, [0, 3])
    got = {
        r.vid: r.bc for r in betweenness_approx(e, verts, piv).collect()
    }
    # from s=0: δ(1)=2, δ(2)=1; from s=3: δ(2)=2, δ(1)=1 → bc = (4/2)/2·3 = 3
    assert got[1] == pytest.approx(3.0) and got[2] == pytest.approx(3.0)
    assert got[0] == pytest.approx(0.0) and got[3] == pytest.approx(0.0)
    again = {
        r.vid: r.bc for r in betweenness_approx(e, verts, piv).collect()
    }
    assert got == again


def test_max_depth_truncation_and_empty_pivots(spark):
    e = _sym(spark, [(0, 1), (1, 2), (2, 3)])
    verts = _vids(spark, range(4))
    # depth 1: only adjacent pairs reachable → nothing is "between"
    got = {
        r.vid: r.bc
        for r in betweenness_approx(e, verts, verts, max_depth=1).collect()
    }
    assert all(v == pytest.approx(0.0) for v in got.values())
    with pytest.raises(ValueError):
        betweenness_approx(e, verts, verts.filter(F.lit(False)))
