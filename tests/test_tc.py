import pytest

from conftest import edges_df
from fixtures import GOLDEN_TC, er_graph
from oracles import tc_oracle

from tric_spark import graph
from tric_spark.operators import tc
from tric_spark.sources import read_binary_csr

KARATE = "/root/reference/karate.bin"


@pytest.mark.parametrize("name", sorted(GOLDEN_TC))
def test_golden_micrographs(spark, name):
    pairs, expected = GOLDEN_TC[name]
    canon = graph.canonical_edges(edges_df(spark, pairs))
    deg = graph.degrees(graph.symmetrize(canon))
    odeg = graph.orient_by_degree(canon, deg)
    assert tc.triangle_count_join(canon) == expected
    assert tc.triangle_count_join(canon, prune=True) == expected
    assert tc.triangle_count_join(odeg, deg=deg) == expected
    assert tc.triangle_count_adj(odeg) == expected
    assert tc.triangle_count_adj(canon) == expected
    assert tc.triangle_count_adj2(odeg) == expected


def test_karate_global_and_per_vertex(spark):
    edges = read_binary_csr(spark, KARATE)
    canon = graph.canonical_edges(edges)
    deg = graph.degrees(graph.symmetrize(canon))
    odeg = graph.orient_by_degree(canon, deg)

    assert tc.triangle_count_join(canon) == 45
    assert tc.triangle_count_join(odeg, deg=deg) == 45
    assert tc.triangle_count_adj(odeg) == 45
    assert tc.triangle_count_adj2(odeg) == 45

    pv = {r.vid: r.tc for r in tc.triangles_per_vertex_join(canon).collect()}
    expected_first10 = [18, 12, 11, 10, 2, 3, 3, 6, 5, 0]
    for v, want in enumerate(expected_first10):
        assert pv.get(v, 0) == want, f"v{v}"

    pv2 = {r.vid: r.tc for r in tc.triangles_per_vertex_adj(odeg).collect()}
    assert pv2 == pv

    pv3 = {r.vid: r.tc for r in tc.triangles_per_vertex_adj2(odeg).collect()}
    assert pv3 == pv


def test_random_graph_vs_oracle(spark):
    pairs = er_graph(n=80, p_inv=12)
    total, per = tc_oracle(pairs)
    assert total > 0  # fixture sanity: graph must actually have triangles
    canon = graph.canonical_edges(edges_df(spark, pairs))
    deg = graph.degrees(graph.symmetrize(canon))
    odeg = graph.orient_by_degree(canon, deg)

    assert tc.triangle_count_join(canon) == total
    assert tc.triangle_count_join(canon, prune=True) == total
    assert tc.triangle_count_join(odeg, deg=deg) == total
    assert tc.triangle_count_adj(odeg) == total
    assert tc.triangle_count_adj2(odeg) == total

    pv = {r.vid: r.tc for r in tc.triangles_per_vertex_adj(odeg).collect()}
    assert pv == per
    pv2 = {r.vid: r.tc for r in tc.triangles_per_vertex_adj2(odeg).collect()}
    assert pv2 == per


def test_auto_strategy_rule_and_dispatch(spark):
    """VERDICT r4 #2: the measured kernel-crossover rule — Arrow
    self-adjacency below AUTO_ARROW_MAX_EDGES, JVM wedge-join above — and
    the auto dispatcher returning the same exact counts as every forced
    kernel."""
    assert tc.pick_strategy(1_000) == "adj2"
    assert tc.pick_strategy(tc.AUTO_ARROW_MAX_EDGES) == "adj2"
    assert tc.pick_strategy(tc.AUTO_ARROW_MAX_EDGES + 1) == "join"

    edges = read_binary_csr(spark, KARATE)
    canon = graph.canonical_edges(edges)
    deg = graph.degrees(graph.symmetrize(canon))
    odeg = graph.orient_by_degree(canon, deg)

    # auto (small m -> adj2 path) and a forced large-m auto (-> join path)
    assert tc.triangle_count(odeg, strategy="auto", deg=deg) == 45
    assert (
        tc.triangle_count(
            odeg, strategy="auto", deg=deg, m=tc.AUTO_ARROW_MAX_EDGES + 1
        )
        == 45
    )
    for s in ("adj2", "adj", "join", "salted"):
        assert tc.triangle_count(odeg, strategy=s, deg=deg) == 45

    pv_auto = {r.vid: r.tc for r in tc.triangles_per_vertex(odeg, deg=deg).collect()}
    pv_join = {
        r.vid: r.tc
        for r in tc.triangles_per_vertex(odeg, strategy="join", deg=deg).collect()
    }
    assert pv_auto == pv_join

    import pytest as _pytest

    with _pytest.raises(ValueError):
        tc.triangle_count(odeg, strategy="nope")


def test_clustering_by_degree_matches_python(spark):
    """c(k) curve equals the python groupBy of the (already-verified)
    per-vertex lcc values."""
    from collections import defaultdict

    from tric_spark.operators.tc import clustering_by_degree, local_clustering

    pairs = er_graph(n=50, p_inv=4, seed=53)
    canon = edges_df(spark, [(min(u, v), max(u, v)) for u, v in pairs]).distinct()
    deg = graph.degrees(graph.symmetrize(canon))
    oriented = graph.orient_by_degree(canon, deg)
    lcc = {(r.vid): (r.degree, r.lcc) for r in local_clustering(oriented, deg).collect()}
    by_deg = defaultdict(list)
    for d, c in lcc.values():
        by_deg[d].append(c)
    expect = {
        d: (len(cs), round(sum(cs) / len(cs), 6)) for d, cs in by_deg.items()
    }
    got = {
        r.degree: (r.n_vertices, r.avg_lcc)
        for r in clustering_by_degree(oriented, deg).collect()
    }
    assert got == expect and got
