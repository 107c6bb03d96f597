"""hitting_times: closed-form micrographs + trajectory replay (the
tol=0 fixed-iteration pattern — python replays the SAME truncated value
iteration, so no convergence wait)."""

import collections

from conftest import edges_df
from fixtures import PATH4, STAR10, er_graph

from tric_spark import graph
from tric_spark.operators.hittime import hitting_times


def _spark_h(spark, pairs, targets, iters):
    sym = graph.symmetrize(graph.canonical_edges(edges_df(spark, pairs)))
    t = spark.createDataFrame([(v,) for v in targets], "vid long")
    return {
        r["vid"]: r["h"] for r in hitting_times(sym, t, iters=iters).collect()
    }


def _replay(pairs, targets, iters):
    adj = collections.defaultdict(set)
    for a, b in pairs:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    h = {v: 0.0 for v in adj}
    for _ in range(iters):
        h = {
            v: 0.0
            if v in targets
            else 1.0 + sum(h[u] for u in adj[v]) / len(adj[v])
            for v in adj
        }
    return h


def test_star_closed_form(spark):
    # center is the target: every leaf hits in exactly one step
    got = _spark_h(spark, STAR10, {0}, iters=4)
    assert got[0] == 0.0
    assert all(got[v] == 1.0 for v in range(1, 11))


def test_path_replay(spark):
    got = _spark_h(spark, PATH4, {0}, iters=8)
    want = _replay(PATH4, {0}, 8)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, v


def test_er_replay_multi_target(spark):
    pairs = er_graph(40, 12)
    targets = {0, 7, 21}
    got = _spark_h(spark, pairs, targets, iters=6)
    want = _replay(pairs, targets, 6)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, v


def test_unreachable_saturates(spark):
    # two components; target in one -> the other saturates at iters
    pairs = [(0, 1), (2, 3)]
    got = _spark_h(spark, pairs, {0}, iters=5)
    assert got[1] == 1.0 and got[2] == 5.0 and got[3] == 5.0
