"""label_spreading vs a pure-python mass-propagation referee."""

from collections import defaultdict

from conftest import edges_df

from tric_spark import graph
from tric_spark.operators.lp import label_spreading

# barbell: left K3 {0,1,2} seeded "a" at 0, right K3 {3,4,5} seeded "b"
# at 5, bridge 2-3
PAIRS = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 4), (3, 5), (4, 5)]
SEEDS = [(0, "a"), (5, "b")]


def _py_spread(pairs, seeds, iters):
    adj = defaultdict(list)
    for u, v in pairs:
        adj[u].append(v)
        adj[v].append(u)
    deg = {v: len(ns) for v, ns in adj.items()}
    seed_map = dict(seeds)
    state = {(v, l): 1.0 for v, l in seeds}
    for _ in range(iters):
        nxt = defaultdict(float)
        for (u, l), m in state.items():
            for v in adj[u]:
                nxt[(v, l)] += m / deg[u]
        state = {
            (v, l): m for (v, l), m in nxt.items() if v not in seed_map
        }
        state.update({(v, l): 1.0 for v, l in seeds})
    best = {}
    for (v, l), m in state.items():
        key = (-round(m + 1e-9, 6), l)
        if v not in best or key < best[v][0]:
            best[v] = (key, l, round(m + 1e-9, 6))
    return {v: (l, s) for v, (_, l, s) in best.items()}


def test_label_spreading_matches_referee(spark):
    canon = edges_df(spark, PAIRS)
    sym = graph.symmetrize(canon)
    deg = graph.degrees(sym)
    seeds = spark.createDataFrame(SEEDS, "vid long, label string")
    got = {
        r.vid: (r.pred_label, r.score)
        for r in label_spreading(sym, deg, seeds, num_iter=2).collect()
    }
    assert got == _py_spread(PAIRS, SEEDS, 2)
    # seeds stay clamped; near-side vertices adopt the near seed
    assert got[0] == ("a", 1.0) and got[5] == ("b", 1.0)
    assert got[1][0] == "a" and got[4][0] == "b"


def test_label_spreading_sparse_state(spark):
    # a vertex out of reach in 2 hops from any seed gets NO row
    pairs = PAIRS + [(6, 7), (7, 8)]
    sym = graph.symmetrize(edges_df(spark, pairs))
    deg = graph.degrees(sym)
    seeds = spark.createDataFrame([(0, "a")], "vid long, label string")
    got = {r.vid for r in label_spreading(sym, deg, seeds, num_iter=2).collect()}
    assert 6 not in got and 7 not in got and 8 not in got
    assert {0, 1, 2, 3} <= got
