"""random_failure_robustness + embedding_anisotropy."""

import math

from conftest import edges_df

from tric_spark import graph
from tric_spark.operators.embstats import embedding_anisotropy
from tric_spark.operators.robustness import random_failure_robustness


def test_random_failure_fractions(spark):
    pairs = [(i, i + 1) for i in range(20)]  # path of 21 vertices
    sym = graph.symmetrize(graph.canonical_edges(edges_df(spark, pairs)))
    deg = graph.degrees(sym)
    got = {
        r.frac: r
        for r in random_failure_robustness(sym, deg, fractions=(0.0, 0.5)).collect()
    }
    base = got[0.0]
    assert base.n_removed == 0 and base.giant_size == 21 and base.giant_frac == 1.0
    half = got[0.5]
    # md5 coin removes roughly half; the path fragments
    assert 0 < half.n_removed < 21
    assert half.giant_size <= half.n_remaining
    assert half.n_removed + half.n_remaining == 21


def test_anisotropy_closed_form(spark):
    vecs = {0: [1.0, 0.0], 1: [1.0, 0.0], 2: [0.0, 2.0], 3: None}
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    r = embedding_anisotropy(df).collect()[0]
    assert r.n == 3
    # unit vecs: e1, e1, e2 -> pairwise cosines: (0,1)=1 both ways, the
    # four mixed pairs are 0 -> mean = 2/6
    assert r.mean_cosine == round(2.0 / 6.0, 6)


def test_anisotropy_aligned_cone(spark):
    # identical directions -> mean cosine exactly 1
    df = spark.createDataFrame(
        [(i, [1.0 * (i + 1), 2.0 * (i + 1)]) for i in range(4)],
        "vec_id long, embedding array<double>",
    )
    r = embedding_anisotropy(df).collect()[0]
    assert math.isclose(r.mean_cosine, 1.0, abs_tol=1e-6)
