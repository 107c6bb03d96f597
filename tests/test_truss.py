"""k-truss decomposition vs a sequential one-at-a-time peeling oracle."""

from collections import defaultdict

from conftest import edges_df
from fixtures import K5, TWO_K4, er_graph

from tric_spark import graph
from tric_spark.operators.truss import edge_support, ktruss_edges, truss_numbers


def truss_oracle(pairs):
    """Textbook sequential peel: repeatedly remove THE minimum-support edge,
    tracking the level k = max(k, support+2) — the ground truth the batch
    peeling must reproduce."""
    edges = {tuple(sorted(e)) for e in pairs if e[0] != e[1]}
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    sup = {(u, v): len(adj[u] & adj[v]) for u, v in edges}
    truss = {}
    k = 2
    while sup:
        e, s = min(sup.items(), key=lambda kv: (kv[1], kv[0]))
        k = max(k, s + 2)
        truss[e] = k
        u, v = e
        for w in adj[u] & adj[v]:
            for f in (tuple(sorted((u, w))), tuple(sorted((v, w)))):
                if f in sup:
                    sup[f] -= 1
        adj[u].discard(v)
        adj[v].discard(u)
        del sup[e]
    return truss


def _canon(spark, pairs):
    return graph.canonical_edges(edges_df(spark, pairs))


def test_edge_support_k5(spark):
    # every K5 edge lies in exactly 3 triangles
    sup = {(r.src, r.dst): r.support for r in edge_support(_canon(spark, K5)).collect()}
    assert len(sup) == 10 and set(sup.values()) == {3}


def test_ktruss_goldens(spark):
    # K5 is a 5-truss; two disjoint K4s form a (non-connected) 4-truss
    k5 = _canon(spark, K5)
    assert ktruss_edges(k5, 5).count() == 10
    assert ktruss_edges(k5, 6).count() == 0
    two_k4 = _canon(spark, TWO_K4)
    assert ktruss_edges(two_k4, 4).count() == 12
    assert ktruss_edges(two_k4, 5).count() == 0
    # the 2-truss is the input itself
    assert ktruss_edges(two_k4, 2).count() == two_k4.count()
    # a star has triangles nowhere: 3-truss empty
    star = _canon(spark, [(0, i) for i in range(1, 6)])
    assert ktruss_edges(star, 3).count() == 0


def test_truss_numbers_vs_oracle(spark):
    pairs = er_graph(n=60, p_inv=4)
    want = truss_oracle(pairs)
    got = {
        (r.src, r.dst): r.truss for r in truss_numbers(_canon(spark, pairs)).collect()
    }
    assert got == want
    assert max(want.values()) >= 3  # the fixture actually has trusses


def test_truss_numbers_fold_bounds_plan_width(spark):
    """fold_every=1 (checkpointed fold EVERY wave) must give the identical
    decomposition — the bounded-union path of VERDICT r4 #8 applied here."""
    pairs = er_graph(n=40, p_inv=4)
    canon = _canon(spark, pairs)
    base = {(r.src, r.dst): r.truss for r in truss_numbers(canon).collect()}
    folded = {
        (r.src, r.dst): r.truss
        for r in truss_numbers(canon, fold_every=1).collect()
    }
    assert folded == base == truss_oracle(pairs)
