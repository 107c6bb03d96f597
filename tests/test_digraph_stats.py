"""Reciprocity and degree assortativity: hand goldens, numpy oracle,
loop/duplicate hygiene."""

import numpy as np
import pytest

from tests.conftest import edges_df
from tests.fixtures import PATH4, STAR10, er_graph
from tric_spark import graph
from tric_spark.operators.digraph_stats import (
    degree_assortativity,
    reciprocal_pairs,
    reciprocity,
)


def test_reciprocity_golden(spark):
    # 1<->2 mutual, 1->3 one-way, a self-loop, and a duplicate edge
    d = edges_df(spark, [(1, 2), (2, 1), (1, 3), (4, 4), (1, 2)])
    row = reciprocity(d).collect()[0]
    assert (row.n_edges, row.n_reciprocal) == (3, 2)
    assert row.reciprocity == pytest.approx(round(2 / 3, 6))
    assert [(r.src, r.dst) for r in reciprocal_pairs(d).collect()] == [(1, 2)]


def test_reciprocity_all_and_none(spark):
    both = edges_df(spark, [(1, 2), (2, 1), (2, 3), (3, 2)])
    assert reciprocity(both).collect()[0].reciprocity == 1.0
    one_way = edges_df(spark, [(1, 2), (2, 3)])
    assert reciprocity(one_way).collect()[0].reciprocity == 0.0


def _assort_numpy(pairs):
    from collections import Counter

    deg = Counter()
    for u, v in pairs:
        deg[u] += 1
        deg[v] += 1
    xs, ys = [], []
    for u, v in pairs:
        xs += [deg[u], deg[v]]
        ys += [deg[v], deg[u]]
    return float(np.corrcoef(xs, ys)[0, 1])


@pytest.mark.parametrize("pairs", [STAR10, PATH4, er_graph(60, 6)])
def test_assortativity_matches_numpy(spark, pairs):
    canon = graph.canonical_edges(edges_df(spark, pairs))
    sym = graph.symmetrize(canon)
    deg = graph.degrees(sym)
    got = degree_assortativity(sym, deg).collect()[0].assortativity
    assert got == pytest.approx(_assort_numpy(pairs), abs=1e-6)


def test_star_is_perfectly_disassortative(spark):
    canon = graph.canonical_edges(edges_df(spark, STAR10))
    sym = graph.symmetrize(canon)
    got = degree_assortativity(sym, graph.degrees(sym)).collect()[0].assortativity
    assert got == pytest.approx(-1.0, abs=1e-6)
