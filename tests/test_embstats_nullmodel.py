"""embedding_dim_stats + triangle_null_ratio."""

import math

from conftest import edges_df

from tric_spark import graph
from tric_spark.operators.digraph_stats import triangle_null_ratio
from tric_spark.operators.embstats import embedding_dim_stats


def test_embedding_dim_stats_exact(spark):
    vecs = [[1.0, 0.0, 5.0], [3.0, 0.0, 1.0], [2.0, 0.0, 3.0], None]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<double>"
    )
    rows = {r.dim: r for r in embedding_dim_stats(df).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1].n == 3 and rows[1].mean == 2.0 and rows[1].vmin == 1.0
    assert rows[1].std == round(math.sqrt(2.0 / 3.0), 6)
    assert rows[2].dead and rows[2].std == 0.0  # constant dim flagged
    assert not rows[1].dead and not rows[3].dead
    assert rows[3].vmax == 5.0


def test_embedding_dim_stats_jagged(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [1.0])], "vec_id long, embedding array<double>"
    )
    rows = {r.dim: r.n for r in embedding_dim_stats(df).collect()}
    assert rows == {1: 2, 2: 1}  # raggedness surfaces as per-dim n


def test_triangle_null_ratio_triangle(spark):
    # K3: tc=1, m=3, all degrees 2 -> sum d(d-1)=6 -> null=(6/6)^3/6=1/6
    canon = edges_df(spark, [(0, 1), (0, 2), (1, 2)])
    deg = graph.degrees(graph.symmetrize(canon))
    r = triangle_null_ratio(canon, deg).collect()[0]
    assert r.tc_actual == 1
    assert r.tc_null == round(1.0 / 6.0, 6)
    assert r.ratio == 6.0


def test_triangle_null_ratio_triangle_free(spark):
    canon = edges_df(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
    deg = graph.degrees(graph.symmetrize(canon))
    r = triangle_null_ratio(canon, deg).collect()[0]
    assert r.tc_actual == 0 and r.ratio == 0.0 and r.tc_null > 0
