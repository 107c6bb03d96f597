"""PPR sweep-cut local clustering (nibble.py) vs a pure-python replica."""

from collections import defaultdict

from conftest import edges_df
from fixtures import TWO_K4

from tric_spark import graph
from tric_spark.operators.nibble import best_cut, sweep_cut
from tric_spark.operators.pagerank import personalized_pagerank

# two K4s joined by one bridge {3,4}: the planted cluster around seed 0 is
# the first K4, whose sweep prefix has conductance 1/13
BRIDGED = TWO_K4 + [(3, 4)]


def _ppr2(pairs, seeds, d=0.85):
    """2 fixed iterations of r <- (1-d)e + d A^T D^-1 r from r0 = e —
    the exact personalized_pagerank(tol=0, max_iter=2) trajectory."""
    adj = defaultdict(set)
    for u, v in pairs:
        adj[u].add(v)
        adj[v].add(u)
    e = {v: (1.0 / len(seeds) if v in seeds else 0.0) for v in adj}
    r = dict(e)
    for _ in range(2):
        nxt = {v: (1 - d) * e[v] for v in adj}
        for u in adj:
            share = d * r[u] / len(adj[u])
            for v in adj[u]:
                nxt[v] += share
        r = nxt
    return r, adj


def _sweep_oracle(pairs, seeds, top_t=8):
    r, adj = _ppr2(pairs, seeds)
    scored = sorted(
        ((round(r[v] / len(adj[v]), 6), v) for v in adj),
        key=lambda t: (-t[0], t[1]),
    )[:top_t]
    vol_total = sum(len(adj[v]) for v in adj)
    prefix, volk, rows = set(), 0, []
    for k, (score, v) in enumerate(scored, start=1):
        prefix.add(v)
        volk += len(adj[v])
        cut = sum(1 for u in prefix for w in adj[u] if w not in prefix)
        min_side = min(volk, vol_total - volk)
        cond = round(cut / min_side, 6) if min_side > 0 else None
        rows.append((k, v, score, cond))
    return rows


def _run(spark, pairs, seeds, top_t=8):
    sym = graph.symmetrize(graph.canonical_edges(edges_df(spark, pairs)))
    verts = graph.vertices(sym)
    deg = graph.degrees(sym)
    seeds_df = spark.createDataFrame([(s,) for s in seeds], "vid long")
    ranks = personalized_pagerank(sym, verts, seeds_df, tol=0.0, max_iter=2)
    return sweep_cut(sym, deg, ranks.select("vid", "rank"), top_t=top_t)


def test_sweep_matches_replica(spark):
    got = sorted(
        tuple(r) for r in _run(spark, BRIDGED, [0]).collect()
    )
    want = sorted(_sweep_oracle(BRIDGED, [0]))
    assert got == want


def test_best_cut_finds_planted_cluster(spark):
    sweep = _run(spark, BRIDGED, [0])
    row = best_cut(sweep).collect()[0]
    # the first K4 = prefix of size 4, cut 1, vol 13 -> phi = 1/13
    assert row["k"] == 4
    assert abs(row["conductance"] - round(1 / 13, 6)) < 1e-9


def test_full_cover_prefix_is_null(spark):
    # top_t covers the whole graph: the final prefix's min-side is 0 ->
    # NULL conductance, not a division error (ANSI mode)
    sweep = _run(spark, BRIDGED, [0], top_t=8).collect()
    by_k = {r["k"]: r["conductance"] for r in sweep}
    assert by_k[8] is None
    assert all(by_k[k] is not None for k in range(1, 8))
