"""Property test: on ARBITRARY messy edge lists (self-loops, duplicates,
reversed duplicates, disconnected vertices) every TC kernel agrees with the
independent python oracle — the reference's de-facto 'all variants agree'
strategy (SURVEY §5) driven by hypothesis instead of a fixed corpus."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from conftest import edges_df
from oracles import tc_oracle

from tric_spark import graph
from tric_spark.operators import tc

edge = st.tuples(st.integers(0, 24), st.integers(0, 24))


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pairs=st.lists(edge, min_size=0, max_size=120))
def test_all_tc_kernels_agree_with_oracle(spark, pairs):
    total, per = tc_oracle(pairs)
    canon = graph.canonical_edges(edges_df(spark, pairs or [(0, 0)]))
    deg = graph.degrees(graph.symmetrize(canon))
    odeg = graph.orient_by_degree(canon, deg)
    assert tc.triangle_count_join(canon) == total
    assert tc.triangle_count_join(odeg, deg=deg) == total
    assert tc.triangle_count_adj(odeg) == total
    assert tc.triangle_count_adj2(odeg) == total
    assert tc.triangle_count_adj2_salted(canon, tau=2, num_salts=2) == total
    got = {r.vid: r.tc for r in tc.triangles_per_vertex_adj2(odeg).collect()}
    assert got == per
