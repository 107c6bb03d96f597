from conftest import edges_df
from fixtures import TWO_K4, er_graph
from oracles import cc_oracle

from tric_spark import graph
from tric_spark.operators.cc import cc_star


def _run(spark, pairs):
    canon = graph.canonical_edges(edges_df(spark, pairs))
    sym = graph.symmetrize(canon)
    verts = graph.vertices(sym)
    got = {r.vid: r.comp for r in cc_star(sym, verts).collect()}
    vertices = sorted({v for e in pairs for v in e})
    assert got == cc_oracle(pairs, vertices)
    return got


def test_cc_star_two_cliques(spark):
    got = _run(spark, TWO_K4)
    assert set(got.values()) == {0, 4}


def test_cc_star_long_path(spark):
    """P_200: hash-min needs 200 supersteps; star-contraction needs O(log n).
    This is the regime the algorithm exists for."""
    pairs = [(i, i + 1) for i in range(200)]
    got = _run(spark, pairs)
    assert set(got.values()) == {0}


def test_cc_star_random_sparse(spark):
    pairs = er_graph(n=120, p_inv=80)
    _run(spark, pairs)
