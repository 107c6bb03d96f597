from collections import deque

from conftest import edges_df
from fixtures import TWO_K4, er_graph

from tric_spark import graph
from tric_spark.operators.bfs import bfs_distances


def bfs_oracle(pairs, sources):
    adj = {}
    for u, v in pairs:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    dist = {s: 0 for s in sources}
    q = deque(sources)
    while q:
        x = q.popleft()
        for y in adj.get(x, ()):
            if y not in dist:
                dist[y] = dist[x] + 1
                q.append(y)
    return dist


def _run(spark, pairs, sources):
    sym = graph.symmetrize(graph.canonical_edges(edges_df(spark, pairs)))
    src = spark.createDataFrame([(int(s),) for s in sources], "vid long")
    got = {r.vid: r.dist for r in bfs_distances(sym, src).collect()}
    assert got == bfs_oracle(pairs, sources)
    return got


def test_bfs_path(spark):
    pairs = [(i, i + 1) for i in range(10)]
    got = _run(spark, pairs, [0])
    assert got[10] == 10


def test_bfs_multi_source_disconnected(spark):
    got = _run(spark, TWO_K4, [0, 4])
    assert set(got.values()) == {0, 1}


def test_bfs_unreached_absent(spark):
    got = _run(spark, TWO_K4, [0])
    assert 4 not in got and got[3] == 1


def test_bfs_random(spark):
    pairs = er_graph(n=80, p_inv=20)
    _run(spark, pairs, [0, 7])
