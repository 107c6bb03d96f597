"""Link prediction (CN / Adamic–Adar / resource allocation) vs a python
brute-force oracle, plus the fan-out guard and existing-edge exclusion."""

import math

from conftest import edges_df
from fixtures import er_graph

from tric_spark.operators.linkpred import (
    link_prediction_scores,
    predicted_links_topk,
)


def _sym(spark, pairs):
    both = [(u, v) for u, v in pairs] + [(v, u) for u, v in pairs]
    return edges_df(spark, both)


def _brute(pairs, min_common=1, max_fanout=None, exclude_existing=False):
    adj = {}
    for u, v in pairs:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    deg = {z: len(ns) for z, ns in adj.items()}
    ok = {z for z in deg if max_fanout is None or deg[z] <= max_fanout}
    out = {}
    nodes = sorted(adj)
    edge_set = {(min(u, v), max(u, v)) for u, v in pairs}
    for i, a in enumerate(nodes):
        for b in nodes[i + 1 :]:
            if exclude_existing and (a, b) in edge_set:
                continue
            common = adj[a] & adj[b] & ok
            if len(common) >= min_common and common:
                aa = round(sum(1.0 / math.log(deg[z]) for z in common), 6)
                ra = round(sum(1.0 / deg[z] for z in common), 6)
                out[(a, b)] = (len(common), aa, ra)
    return out


def _got(df):
    return {(r.a, r.b): (r.common, r.aa, r.ra) for r in df.collect()}


def test_linkpred_vs_brute_random_graph(spark):
    pairs = er_graph(n=40, p_inv=5, seed=11)
    got = _got(link_prediction_scores(_sym(spark, pairs), max_fanout=None))
    assert got == _brute(pairs)


def test_linkpred_triangle_golden(spark):
    # triangle 0-1-2 plus pendant 3 on 0: deg = [3,2,2,1]
    pairs = [(0, 1), (0, 2), (1, 2), (0, 3)]
    got = _got(link_prediction_scores(_sym(spark, pairs), max_fanout=None))
    # (1,2): common neighbor 0 (deg 3) → aa = 1/ln3, ra = 1/3
    assert got[(1, 2)] == (1, round(1 / math.log(3), 6), round(1 / 3, 6))
    # (0,1): common neighbor 2 (deg 2); (1,3)/(2,3): via 0
    assert got[(0, 1)] == (1, round(1 / math.log(2), 6), 0.5)
    assert got[(1, 3)] == (1, round(1 / math.log(3), 6), round(1 / 3, 6))


def test_linkpred_min_common_prunes(spark):
    pairs = er_graph(n=40, p_inv=5, seed=11)
    got = _got(link_prediction_scores(_sym(spark, pairs), min_common=2, max_fanout=None))
    assert got == _brute(pairs, min_common=2)
    assert all(c >= 2 for c, _, _ in got.values())


def test_linkpred_fanout_guard_drops_hub_pivots(spark):
    # star hub 0 with 6 leaves plus a 1-2 edge: with max_fanout=5 the hub
    # (deg 6) is excluded as a pivot, so leaf-leaf pairs disappear
    pairs = [(0, i) for i in range(1, 7)] + [(1, 2)]
    got = _got(link_prediction_scores(_sym(spark, pairs), max_fanout=5))
    assert got == _brute(pairs, max_fanout=5)
    assert (3, 4) not in got  # only connected through the excluded hub
    assert (0, 1) in got  # via pivot 2 (deg 2) — unaffected


def test_linkpred_exclude_existing(spark):
    pairs = er_graph(n=40, p_inv=5, seed=11)
    got = _got(
        link_prediction_scores(
            _sym(spark, pairs), max_fanout=None, exclude_existing=True
        )
    )
    assert got == _brute(pairs, exclude_existing=True)
    edge_set = {(min(u, v), max(u, v)) for u, v in pairs}
    assert not (set(got) & edge_set)


def test_predicted_links_topk_ranks_by_aa(spark):
    pairs = er_graph(n=40, p_inv=5, seed=11)
    brute = _brute(pairs, min_common=2, exclude_existing=True)
    rows = predicted_links_topk(_sym(spark, pairs), k=3, min_common=2).collect()
    per = {}
    for r in rows:
        per.setdefault(r.vid, []).append((r.rnk, r.candidate, r.aa))
    for vid, lst in per.items():
        cands = []
        for (a, b), (_, aa, _) in brute.items():
            if a == vid:
                cands.append((b, aa))
            elif b == vid:
                cands.append((a, aa))
        expect = sorted(cands, key=lambda t: (-t[1], t[0]))[:3]
        assert [(c, a) for _, c, a in sorted(lst)] == expect


def test_jaccard_scores_match_brute_force(spark):
    from tric_spark.operators.linkpred import jaccard_scores

    pairs = er_graph(n=40, p_inv=6, seed=9)
    adj = {}
    for u, v in pairs:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    got = {
        (r.a, r.b): (r.common, r.jaccard, r.cosine, r.pa)
        for r in jaccard_scores(_sym(spark, pairs), min_common=1).collect()
    }
    import itertools

    want = {}
    for a, b in itertools.combinations(sorted(adj), 2):
        c = len(adj[a] & adj[b])
        if c >= 1:
            da, db = len(adj[a]), len(adj[b])
            want[(a, b)] = (
                c,
                round(c / (da + db - c), 6),
                round(c / math.sqrt(da * db), 6),
                da * db,
            )
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0] and got[k][3] == want[k][3]
        assert abs(got[k][1] - want[k][1]) < 1e-9
        assert abs(got[k][2] - want[k][2]) < 1e-9
