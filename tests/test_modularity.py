"""Modularity vs a python brute replay, plus the analytic edge cases
(one community → 0, singletons → negative, two cliques → high Q)."""

import pytest

from conftest import edges_df
from fixtures import er_graph

from tric_spark.operators.modularity import modularity


def _sym(spark, pairs):
    both = [(u, v) for u, v in pairs] + [(v, u) for u, v in pairs]
    return edges_df(spark, both)


def _labels(spark, mapping):
    return spark.createDataFrame(
        [(v, l) for v, l in mapping.items()], "vid long, label long"
    )


def _brute(pairs, mapping):
    m = len(set((min(u, v), max(u, v)) for u, v in pairs))
    mc = sum(
        1
        for u, v in set((min(a, b), max(a, b)) for a, b in pairs)
        if mapping[u] == mapping[v]
    )
    deg = {}
    for u, v in pairs:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    dc = {}
    for v, d in deg.items():
        dc[mapping[v]] = dc.get(mapping[v], 0) + d
    return round(mc / m - sum(d * d for d in dc.values()) / (4.0 * m * m), 6)


def test_modularity_vs_brute_random(spark):
    pairs = sorted(set((min(u, v), max(u, v)) for u, v in er_graph(n=40, p_inv=5, seed=17)))
    mapping = {v: v % 4 for v in range(40)}
    r = modularity(_sym(spark, pairs), _labels(spark, mapping)).collect()[0]
    assert r.modularity == pytest.approx(_brute(pairs, mapping), abs=2e-6)
    assert r.m_edges == len(pairs)


def test_one_community_is_zero(spark):
    pairs = [(0, 1), (1, 2), (2, 3), (3, 0)]
    r = modularity(_sym(spark, pairs), _labels(spark, {v: 0 for v in range(4)}))
    assert r.collect()[0].modularity == 0.0


def test_singletons_are_negative(spark):
    pairs = [(0, 1), (1, 2), (2, 3), (3, 0)]
    r = modularity(_sym(spark, pairs), _labels(spark, {v: v for v in range(4)}))
    assert r.collect()[0].modularity < 0


def test_two_cliques_bridge(spark):
    # two 4-cliques joined by one edge, labeled by clique: the textbook
    # high-modularity case — Q = 12/13 − 2·(13/26)² = 0.423077
    c1 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    c2 = [(a + 4, b + 4) for a, b in c1]
    pairs = c1 + c2 + [(0, 4)]
    mapping = {v: v // 4 for v in range(8)}
    r = modularity(_sym(spark, pairs), _labels(spark, mapping)).collect()[0]
    assert r.modularity == pytest.approx(_brute(pairs, mapping), abs=2e-6)
    assert r.modularity > 0.4
    assert r.n_communities == 2


def test_empty_graph_zero(spark):
    e = edges_df(spark, []).limit(0)
    r = modularity(e, _labels(spark, {0: 0})).collect()[0]
    assert r.modularity == 0.0 and r.m_edges == 0
