"""rp_project vs a numpy referee using the same md5 ±1 matrix, plus the
JL norm-preservation sanity and the jagged-row NULL guard."""

import numpy as np

from tric_spark.operators.similarity import hyperplane_matrix, rp_project


def _df(spark, vecs):
    rows = [(int(i), [float(x) for x in v]) for i, v in vecs.items()]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_rp_matches_numpy_referee(spark):
    rng = np.random.RandomState(7)
    vecs = {i: rng.randn(24) for i in range(30)}
    out = rp_project(_df(spark, vecs), out_dims=16, seed=42)
    mat = np.array(hyperplane_matrix(16, 24, seed=42))
    scale = 1.0 / np.sqrt(16)
    got = {r.vec_id: np.array(r.proj) for r in out.collect()}
    for i, v in vecs.items():
        want = np.round(mat @ v * scale, 6)
        assert np.array_equal(got[i], want), i


def test_rp_preserves_norms_on_average(spark):
    # E[||proj||^2] = ||v||^2 for the scaled ±1 JL matrix; with 16 output
    # dims the mean ratio over 50 vectors concentrates near 1
    rng = np.random.RandomState(11)
    vecs = {i: rng.randn(32) for i in range(50)}
    out = rp_project(_df(spark, vecs), out_dims=16, seed=42).collect()
    ratios = [
        float(np.sum(np.array(r.proj) ** 2) / np.sum(vecs[r.vec_id] ** 2))
        for r in out
    ]
    assert 0.7 < float(np.mean(ratios)) < 1.3


def test_rp_jagged_row_projects_null(spark):
    rows = [(0, [1.0, 2.0, 3.0]), (1, [1.0, 2.0])]  # widths differ
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r.vec_id: r.proj for r in rp_project(df, out_dims=4).collect()}
    assert got[0] is not None and len(got[0]) == 4
    assert got[1] is None


def test_rp_empty_frame(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert rp_project(df, out_dims=4).count() == 0
