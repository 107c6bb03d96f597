import json
import os

from conftest import edges_df

from tric_spark import graph
from tric_spark.operators import tc
from tric_spark.operators.cc import cc_star, connected_components
from tric_spark.operators.lp import label_propagation
from tric_spark.operators.pagerank import pagerank
from tric_spark.streaming.supersteps import SuperstepDriver


def _empty(spark):
    return spark.createDataFrame([], "src long, dst long")


def test_empty_graph_all_kernels(spark):
    canon = graph.canonical_edges(_empty(spark))
    sym = graph.symmetrize(canon)
    verts = graph.vertices(sym)
    deg = graph.degrees(sym)
    assert tc.triangle_count_join(canon) == 0
    assert tc.triangle_count_adj(graph.orient_by_degree(canon, deg)) == 0
    assert pagerank(sym, verts).count() == 0
    assert connected_components(sym, verts).count() == 0
    assert cc_star(sym, verts).count() == 0
    assert label_propagation(sym, verts, num_iter=1).count() == 0


def test_single_edge_graph(spark):
    canon = graph.canonical_edges(edges_df(spark, [(7, 3)]))
    sym = graph.symmetrize(canon)
    verts = graph.vertices(sym)
    assert tc.triangle_count_join(canon) == 0
    pr = {r.vid: r.rank for r in pagerank(sym, verts).collect()}
    assert abs(pr[3] - 0.5) < 1e-9 and abs(pr[7] - 0.5) < 1e-9
    assert {r.comp for r in connected_components(sym, verts).collect()} == {3}


def test_resume_ignores_uncommitted_checkpoint(spark, tmp_path):
    """A crash between data write and meta rename leaves an uncommitted
    step dir; resume must ignore it and redo that superstep."""
    pairs = [(0, 1), (1, 2), (2, 3), (4, 5)]
    canon = graph.canonical_edges(edges_df(spark, pairs))
    sym = graph.symmetrize(canon)
    verts = graph.vertices(sym)
    ckdir = str(tmp_path / "ck")

    d1 = SuperstepDriver(spark, ckdir, kill_after=2)
    try:
        connected_components(sym, verts, driver=d1)
    except RuntimeError:
        pass
    # simulate torn write: a later step dir with data but NO meta
    steps = sorted(os.listdir(ckdir))
    torn = os.path.join(ckdir, "step_00099")
    os.makedirs(os.path.join(torn, "data"))
    with open(os.path.join(torn, "data", "garbage.parquet"), "w") as f:
        f.write("not parquet")

    d2 = SuperstepDriver(spark, ckdir)
    got = {
        r.vid: r.comp
        for r in connected_components(sym, verts, driver=d2).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 4}
    # and the torn dir was never treated as a resume point
    meta = json.load(open(os.path.join(ckdir, steps[-1], "_META.json")))
    assert meta["superstep"] < 99
