"""louvain_move: trajectory replay (same synchronous rules in python)
plus structural convergence on a two-community micrograph."""

import collections

from conftest import edges_df
from fixtures import er_graph

from tric_spark import graph
from tric_spark.operators.louvain import louvain_move

TWO_TRI = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]


def _spark_lab(spark, pairs, rounds):
    sym = graph.symmetrize(graph.canonical_edges(edges_df(spark, pairs)))
    return {
        r["vid"]: r["community"]
        for r in louvain_move(sym, rounds=rounds).collect()
    }


def _replay(pairs, rounds):
    adj = collections.defaultdict(set)
    for a, b in pairs:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    deg = {v: len(ns) for v, ns in adj.items()}
    m2 = sum(deg.values())
    lab = {v: v for v in adj}
    for r in range(1, rounds + 1):
        tot = collections.Counter()
        csize = collections.Counter()
        for v in adj:
            tot[lab[v]] += deg[v]
            csize[lab[v]] += 1
        nxt = {}
        for v in adj:
            if (v + r) % 2 != 0:  # alternating-parity activity schedule
                nxt[v] = lab[v]
                continue
            kvc = collections.Counter(lab[u] for u in adj[v])
            cands = set(kvc) | {lab[v]}
            best = None
            for c in sorted(cands):
                if csize[lab[v]] == 1 and csize[c] == 1 and c > lab[v]:
                    continue
                s = m2 * kvc.get(c, 0) - deg[v] * (
                    tot[c] - (deg[v] if c == lab[v] else 0)
                )
                if best is None or s > best[0]:
                    best = (s, c)
            nxt[v] = best[1]
        lab = nxt
    return lab


def test_replay_two_triangles_rounds(spark):
    for rounds in (1, 2):
        assert _spark_lab(spark, TWO_TRI, rounds) == _replay(TWO_TRI, rounds)


def test_replay_er(spark):
    pairs = er_graph(40, 10)
    assert _spark_lab(spark, pairs, 2) == _replay(pairs, 2)


def test_converges_to_planted_communities(spark):
    # two triangles + one bridge: by round 3 the labels partition
    # exactly into the triangles (replay-traced; the parity schedule
    # breaks the full-sync period-2 thrash)
    got = _spark_lab(spark, TWO_TRI, 3)
    assert len({got[0], got[1], got[2]}) == 1
    assert len({got[3], got[4], got[5]}) == 1
    assert got[0] != got[3]


def test_more_rounds_is_stable(spark):
    got3 = _spark_lab(spark, TWO_TRI, 3)
    got6 = _spark_lab(spark, TWO_TRI, 6)
    assert got3 == got6


def test_aggregate_community_graph(spark):
    from pyspark.sql import functions as F

    from tric_spark.operators.louvain import louvain_aggregate

    sym = graph.symmetrize(graph.canonical_edges(edges_df(spark, TWO_TRI)))
    lab = spark.createDataFrame(
        [(v, 0 if v < 3 else 3) for v in range(6)], "vid long, community long"
    )
    got = {
        (r["src_c"], r["dst_c"]): r["weight"]
        for r in louvain_aggregate(sym, lab).collect()
    }
    # 3 intra undirected edges per triangle = 6 sym rows on the self-loop
    assert got == {(0, 0): 6, (3, 3): 6, (0, 3): 1, (3, 0): 1}
