from conftest import edges_df

from tric_spark import graph
from tric_spark.operators.bipartite import bipartite_components


def _run(spark, pairs):
    canon = graph.canonical_edges(edges_df(spark, pairs))
    sym = graph.symmetrize(canon)
    verts = graph.vertices(sym)
    return {
        r.component: (r.n_vertices, r.n_conflicts, r.is_bipartite)
        for r in bipartite_components(canon, sym, verts).collect()
    }


def test_mixed_components(spark):
    # comp 0: 4-cycle (bipartite); comp 10: triangle (odd cycle);
    # comp 20: star (bipartite); comp 30: 5-cycle (odd)
    got = _run(
        spark,
        [(0, 1), (1, 2), (2, 3), (3, 0)]
        + [(10, 11), (11, 12), (10, 12)]
        + [(20, 21), (20, 22), (20, 23)]
        + [(30, 31), (31, 32), (32, 33), (33, 34), (30, 34)],
    )
    assert got[0] == (4, 0, True)
    assert got[10] == (3, 1, False)
    assert got[20] == (4, 0, True)
    assert got[30][2] is False and got[30][1] >= 1


def test_conflict_count_k4(spark):
    # K4 BFS from 0: parities 0,1,1,1 -> the 3 edges among {1,2,3} conflict
    got = _run(spark, [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)])
    assert got[0] == (4, 3, False)
