import pytest

from conftest import edges_df
from fixtures import er_graph
from oracles import cc_oracle

from tric_spark import graph
from tric_spark.operators.cc import connected_components
from tric_spark.operators.pagerank import pagerank
from tric_spark.streaming.supersteps import SuperstepDriver


def _tables(spark, pairs):
    canon = graph.canonical_edges(edges_df(spark, pairs))
    sym = graph.symmetrize(canon)
    return sym, graph.vertices(sym)


def test_kill_and_resume_bit_identical(spark, tmp_path):
    """Kill after 2 committed supersteps, resume, final state must be
    bit-identical to an uninterrupted run (SURVEY §5 item 5)."""
    pairs = er_graph(n=100, p_inv=60)
    sym, verts = _tables(spark, pairs)

    uninterrupted = {
        r.vid: r.comp
        for r in connected_components(
            sym, verts, driver=SuperstepDriver(spark, str(tmp_path / "full"))
        ).collect()
    }

    killer = SuperstepDriver(spark, str(tmp_path / "killed"), kill_after=2)
    with pytest.raises(RuntimeError, match="killed after superstep"):
        connected_components(sym, verts, max_iter=200, driver=killer)

    resumed_driver = SuperstepDriver(spark, str(tmp_path / "killed"))
    resumed = {
        r.vid: r.comp
        for r in connected_components(sym, verts, driver=resumed_driver).collect()
    }
    assert resumed == uninterrupted
    vertices = sorted({v for e in pairs for v in e})
    assert resumed == cc_oracle(pairs, vertices)


def test_resume_of_finished_run_returns_final_state(spark, tmp_path):
    pairs = [(0, 1), (1, 2), (3, 4)]
    sym, verts = _tables(spark, pairs)
    d1 = SuperstepDriver(spark, str(tmp_path / "ck"))
    first = {r.vid: r.comp for r in connected_components(sym, verts, driver=d1).collect()}
    d2 = SuperstepDriver(spark, str(tmp_path / "ck"))
    again = {r.vid: r.comp for r in connected_components(sym, verts, driver=d2).collect()}
    assert first == again == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3}


def test_checkpointed_pagerank_matches_plain(spark, tmp_path):
    pairs = er_graph(n=40, p_inv=8)
    directed = pairs + [(v, u) for u, v in pairs]
    edges = edges_df(spark, directed)
    verts = spark.range(40).withColumnRenamed("id", "vid")
    plain = {r.vid: r.rank for r in pagerank(edges, verts).collect()}
    ck = {
        r.vid: r.rank
        for r in pagerank(
            edges, verts, driver=SuperstepDriver(spark, str(tmp_path / "pr"), every=5)
        ).collect()
    }
    assert set(plain) == set(ck)
    for v in plain:
        assert abs(plain[v] - ck[v]) < 1e-12
