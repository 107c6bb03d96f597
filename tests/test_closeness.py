"""Harmonic closeness vs python BFS brute (exact when pivots = all),
pivot-subset replay, truncation, unreachable zero-fill."""

from collections import deque

import pytest

from conftest import edges_df
from fixtures import er_graph

from tric_spark.operators.closeness import harmonic_closeness_approx


def _sym(spark, pairs):
    both = [(u, v) for u, v in pairs] + [(v, u) for u, v in pairs]
    return edges_df(spark, both)


def _bfs(adj, s, max_depth):
    dist = {s: 0}
    q = deque([s])
    while q:
        x = q.popleft()
        if dist[x] >= max_depth:
            continue
        for y in adj.get(x, ()):
            if y not in dist:
                dist[y] = dist[x] + 1
                q.append(y)
    return dist


def _brute(pairs, n, pivots, max_depth):
    adj = {}
    for u, v in pairs:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    out = {}
    scale = n / len(pivots)
    per_v = {}
    for s in pivots:
        for v, d in _bfs(adj, s, max_depth).items():
            if d > 0:
                per_v.setdefault(v, []).append(d)
    for v in range(n):
        ds = per_v.get(v, [])
        out[v] = (
            len(ds),
            sum(ds),
            round(scale * sum(1.0 / d for d in ds), 6),
        )
    return out


def _run(spark, pairs, n, pivots, max_depth=32):
    verts = spark.range(n).withColumnRenamed("id", "vid")
    pv = spark.createDataFrame([(p,) for p in pivots], "vid long")
    rows = harmonic_closeness_approx(
        _sym(spark, pairs), verts, pv, max_depth=max_depth
    ).collect()
    return {r.vid: (r.n_sources, r.sum_dist, r.harmonic) for r in rows}


def test_exact_harmonic_vs_brute(spark):
    pairs = er_graph(n=30, p_inv=5, seed=13)
    got = _run(spark, pairs, 30, list(range(30)))
    assert got == _brute(pairs, 30, list(range(30)), 32)


def test_pivot_subset_estimate(spark):
    pairs = er_graph(n=30, p_inv=5, seed=13)
    pivots = [0, 7, 14, 21, 28]
    got = _run(spark, pairs, 30, pivots)
    assert got == _brute(pairs, 30, pivots, 32)


def test_path_golden(spark):
    # path 0-1-2-3, all pivots: h(0) = 1 + 1/2 + 1/3, h(1) = 1+1+1/2
    got = _run(spark, [(0, 1), (1, 2), (2, 3)], 4, [0, 1, 2, 3])
    assert got[0] == (3, 6, round(1 + 0.5 + 1 / 3, 6))
    assert got[1] == (3, 4, 2.5)


def test_truncation_consistent(spark):
    pairs = [(i, i + 1) for i in range(6)]  # path of 7
    got = _run(spark, pairs, 7, [0], max_depth=2)
    brute = _brute(pairs, 7, [0], 2)
    assert got == brute
    assert got[3] == (0, 0, 0.0)  # beyond the truncation horizon


def test_unreachable_zero_fill(spark):
    got = _run(spark, [(0, 1)], 4, [0])
    assert got[2] == (0, 0, 0.0) and got[3] == (0, 0, 0.0)
    assert got[1] == (1, 1, 4.0)  # scale n/k = 4


def test_empty_pivots_raise(spark):
    verts = spark.range(3).withColumnRenamed("id", "vid")
    pv = verts.filter("vid < 0")
    with pytest.raises(ValueError):
        harmonic_closeness_approx(_sym(spark, [(0, 1)]), verts, pv)
