import numpy as np
import pytest

from conftest import edges_df
from fixtures import BIPARTITE33, TWO_K4, er_graph
from oracles import cc_oracle, lp_oracle, pagerank_oracle

from tric_spark import graph
from tric_spark.operators.cc import connected_components
from tric_spark.operators.lp import label_propagation
from tric_spark.operators.pagerank import pagerank


def _graph_tables(spark, pairs):
    canon = graph.canonical_edges(edges_df(spark, pairs))
    sym = graph.symmetrize(canon)
    verts = graph.vertices(sym)
    return canon, sym, verts


def test_pagerank_vs_numpy_oracle(spark):
    pairs = er_graph(n=60, p_inv=10)
    # directed graph = both directions plus some one-way edges for dangling
    directed = [(u, v) for u, v in pairs] + [(v, u) for u, v in pairs if (u + v) % 3]
    n = 60
    oracle = pagerank_oracle(directed, n)

    edges = edges_df(spark, directed)
    verts = spark.range(n).withColumnRenamed("id", "vid")
    result = pagerank(edges, verts)
    got = np.zeros(n)
    for r in result.collect():
        got[r.vid] = r.rank
    assert np.allclose(got, oracle, atol=1e-6)
    assert abs(got.sum() - 1.0) < 1e-9  # rank is a probability distribution


def test_pagerank_all_dangling(spark):
    # two isolated vertices with one edge 0→1: vertex 1 dangles
    edges = edges_df(spark, [(0, 1)])
    verts = spark.range(3).withColumnRenamed("id", "vid")
    oracle = pagerank_oracle([(0, 1)], 3)
    got = {r.vid: r.rank for r in pagerank(edges, verts).collect()}
    assert np.allclose([got[i] for i in range(3)], oracle, atol=1e-6)


def test_cc_two_cliques(spark):
    canon, sym, verts = _graph_tables(spark, TWO_K4)
    got = {r.vid: r.comp for r in connected_components(sym, verts).collect()}
    assert got == cc_oracle(TWO_K4, range(8))
    assert set(got.values()) == {0, 4}


def test_cc_random_vs_oracle(spark):
    pairs = er_graph(n=100, p_inv=60)  # sparse → several components
    vertices = sorted({v for e in pairs for v in e})
    canon, sym, verts = _graph_tables(spark, pairs)
    got = {r.vid: r.comp for r in connected_components(sym, verts).collect()}
    assert got == cc_oracle(pairs, vertices)


def test_lp_bipartite_and_random(spark):
    for pairs, n_iter in [(BIPARTITE33, 2), (er_graph(70, 8), 3)]:
        vertices = sorted({v for e in pairs for v in e})
        canon, sym, verts = _graph_tables(spark, pairs)
        got = {r.vid: r.label for r in label_propagation(sym, verts, num_iter=n_iter).collect()}
        assert got == lp_oracle(pairs, vertices, n_iter)


def test_personalized_pagerank_vs_oracle(spark):
    import numpy as np
    from oracles import ppr_oracle
    from tric_spark.operators.pagerank import personalized_pagerank

    pairs = er_graph(n=50, p_inv=8)
    directed = pairs + [(v, u) for u, v in pairs if (u + v) % 2]  # some dangling
    n = 50
    seeds = [0, 3, 7]
    oracle = ppr_oracle(directed, n, seeds)
    edges = edges_df(spark, directed)
    verts = spark.range(n).withColumnRenamed("id", "vid")
    src = spark.createDataFrame([(s,) for s in seeds], "vid long")
    got = np.zeros(n)
    for r in personalized_pagerank(edges, verts, src).collect():
        got[r.vid] = r.rank
    assert np.allclose(got, oracle, atol=1e-6)
    # seeds hold well above the uniform share (3/50 = 0.06)
    assert got[seeds].sum() > 0.1


def test_weighted_pagerank_vs_oracle(spark):
    import numpy as np
    import random
    from oracles import weighted_pagerank_oracle
    from tric_spark.operators.pagerank import weighted_pagerank

    rng = random.Random(5)
    pairs = er_graph(n=40, p_inv=6)
    triples = [(u, v, 1.0 + rng.randint(0, 9)) for u, v in pairs] + [
        (v, u, 1.0 + rng.randint(0, 9)) for u, v in pairs if (u + v) % 3
    ]
    n = 40
    oracle = weighted_pagerank_oracle(triples, n)
    df = spark.createDataFrame(triples, "src long, dst long, weight double")
    verts = spark.range(n).withColumnRenamed("id", "vid")
    got = np.zeros(n)
    for r in weighted_pagerank(df, verts).collect():
        got[r.vid] = r.rank
    assert np.allclose(got, oracle, atol=1e-6)

    # unit weights must reduce to the unweighted kernel
    from tric_spark.operators.pagerank import pagerank
    unit = spark.createDataFrame(
        [(u, v, 1.0) for u, v, _ in triples], "src long, dst long, weight double"
    )
    w1 = {r.vid: r.rank for r in weighted_pagerank(unit, verts).collect()}
    u1 = {r.vid: r.rank for r in pagerank(unit.select("src", "dst"), verts).collect()}
    for v in w1:
        assert abs(w1[v] - u1[v]) < 1e-9
