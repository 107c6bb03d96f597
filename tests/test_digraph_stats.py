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


# --- power-law exponent MLE ---------------------------------------------------

def test_powerlaw_alpha_matches_numpy_mle(spark):
    import numpy as np

    from tric_spark.operators.digraph_stats import powerlaw_alpha

    degs = [1, 1, 2, 2, 2, 3, 3, 4, 5, 5, 6, 8, 9, 12, 20, 40]
    df = spark.createDataFrame([(i, d) for i, d in enumerate(degs)], "vid long, degree long")
    r = powerlaw_alpha(df, d_min=2).collect()[0]
    tail = np.array([d for d in degs if d >= 2], dtype=float)
    s = np.sum(np.log(tail / 1.5))
    alpha = 1.0 + len(tail) / s
    assert r.alpha == round(alpha, 6)
    assert r.sigma == round((len(tail) / s) / np.sqrt(len(tail)), 6)
    assert r.n_tail == len(tail) and r.d_min == 2


def test_powerlaw_alpha_recovers_planted_exponent(spark):
    """Degrees drawn from a pure Pareto(α=2.5) tail: the MLE must land
    near 2.5 (deterministic fixture via inverse-CDF on a fixed grid)."""
    import numpy as np

    from tric_spark.operators.digraph_stats import powerlaw_alpha

    u = (np.arange(2000) + 0.5) / 2000.0
    degs = np.floor(2.0 * u ** (-1.0 / 1.5)).astype(int)  # α = 1 + 1.5 = 2.5
    df = spark.createDataFrame(
        [(int(i), int(d)) for i, d in enumerate(degs)], "vid long, degree long"
    )
    # floor-discretization biases the continuous MLE low near the cutoff
    # (CSN §3.4 — the ½-shift only partly corrects it); fit deeper in the
    # tail where the bias shrinks and allow the residual
    r = powerlaw_alpha(df, d_min=5).collect()[0]
    assert 2.25 < r.alpha < 2.6


def test_rich_club_matches_brute_force(spark):
    from tric_spark.operators.digraph_stats import rich_club

    pairs = er_graph(n=30, p_inv=4, seed=13)
    canon = graph.canonical_edges(edges_df(spark, pairs))
    sym = graph.symmetrize(canon)
    deg = graph.degrees(sym)
    got = {
        r.k: (r.n_rich, r.e_rich, r.phi)
        for r in rich_club(canon, deg).collect()
    }

    adj = {}
    for u, v in pairs:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    degs = {v: len(ns) for v, ns in adj.items()}
    for k in set(degs.values()):
        rich = {v for v, dv in degs.items() if dv > k}
        e = sum(1 for u, v in pairs if u in rich and v in rich)
        phi = (
            round(2.0 * e / (len(rich) * (len(rich) - 1)), 6)
            if len(rich) >= 2
            else None
        )
        assert got[k] == (len(rich), e, phi)
