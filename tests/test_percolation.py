import pytest
from pyspark.sql import functions as F

from tests.conftest import edges_df
from tric_spark.operators.percolation import triangle_percolation


def _memberships(df):
    return {(int(r.vid), int(r.community)) for r in df.collect()}


def test_shared_edge_merges_shared_vertex_does_not(spark):
    # triangles A={0,1,2} and B={1,2,3} share edge (1,2) -> one community.
    # triangle C={3,4,5} shares only vertex 3 with B -> its own community.
    canon = edges_df(
        spark,
        [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3), (3, 4), (3, 5), (4, 5)],
    )
    out = triangle_percolation(canon)
    comms = {}
    for vid, c in _memberships(out):
        comms.setdefault(c, set()).add(vid)
    assert sorted(comms.values(), key=sorted) == [{0, 1, 2, 3}, {3, 4, 5}]
    # vertex 3 overlaps: member of BOTH communities
    assert sum(3 in m for m in comms.values()) == 2


def test_triangle_free_graph_is_empty(spark):
    canon = edges_df(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])  # 4-cycle
    assert triangle_percolation(canon).count() == 0


def test_community_label_is_min_edge_key(spark):
    canon = edges_df(spark, [(0, 1), (0, 2), (1, 2)])
    rows = _memberships(triangle_percolation(canon))
    # single triangle: community = key of edge (0,1) = 0*kf + 1
    assert rows == {(0, 1), (1, 1), (2, 1)}


def test_key_factor_guard(spark):
    canon = edges_df(spark, [(0, 10_000_000), (0, 2), (2, 10_000_000)])
    with pytest.raises(ValueError):
        triangle_percolation(canon)
