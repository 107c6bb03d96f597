"""Weighted SSSP vs python Dijkstra, multi-source, unreachable absence,
weighted-vs-hop divergence."""

import heapq

from conftest import edges_df
from fixtures import er_graph

from tric_spark.operators.sssp import shortest_paths


def _wdf(spark, triples):
    return spark.createDataFrame(triples, "src long, dst long, weight double")


def _dijkstra(triples, sources):
    adj = {}
    for u, v, w in triples:
        adj.setdefault(u, []).append((v, w))
    dist = {s: 0.0 for s in sources}
    pq = [(0.0, s) for s in sources]
    heapq.heapify(pq)
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist.get(u, float("inf")):
            continue
        for v, w in adj.get(u, ()):
            nd = d + w
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return dist


def _run(spark, triples, sources, **kw):
    src = spark.createDataFrame([(s,) for s in sources], "vid long")
    return {
        r.vid: r.dist
        for r in shortest_paths(_wdf(spark, triples), src, **kw).collect()
    }


def test_weighted_beats_hop_path(spark):
    # 0→1→2 costs 2; direct 0→2 costs 5: weighted answer takes the detour
    triples = [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 5.0)]
    got = _run(spark, triples, [0])
    assert got == {0: 0.0, 1: 1.0, 2: 2.0}


def test_vs_dijkstra_random_graph(spark):
    pairs = er_graph(n=40, p_inv=4, seed=41)
    triples = [
        (u, v, float((u + v) % 7 + 1)) for u, v in pairs
    ] + [(v, u, float((u * v) % 5 + 1)) for u, v in pairs]
    got = _run(spark, triples, [0])
    assert got == _dijkstra(triples, [0])


def test_multi_source(spark):
    pairs = er_graph(n=40, p_inv=4, seed=43)
    triples = [(u, v, float((u + v) % 7 + 1)) for u, v in pairs]
    got = _run(spark, triples, [0, 17, 33])
    assert got == _dijkstra(triples, [0, 17, 33])


def test_unreachable_absent(spark):
    got = _run(spark, [(0, 1, 2.0)], [0])
    assert got == {0: 0.0, 1: 2.0}  # vertex 5 never appears


def test_round_bound_truncates(spark):
    # chain of 10 unit edges, 3 rounds: only the first 3 hops settle
    triples = [(i, i + 1, 1.0) for i in range(10)]
    got = _run(spark, triples, [0], max_rounds=3)
    assert got == {0: 0.0, 1: 1.0, 2: 2.0, 3: 3.0}
