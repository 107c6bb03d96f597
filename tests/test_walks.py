"""Seeded random walks: exact python-md5 replay, edge validity, and
any-parallelism determinism (the LCG-analog invariant)."""

import hashlib

from conftest import edges_df
from fixtures import er_graph

from tric_spark.operators.walks import random_walks


def _sym(pairs):
    return sorted(set(pairs) | {(v, u) for u, v in pairs})


def _py_walks(pairs, num_steps, seed=42):
    """Reference implementation: same md5-seeded neighbor selection."""
    adj = {}
    for u, v in _sym(pairs):
        adj.setdefault(u, []).append(v)
    for u in adj:
        adj[u].sort()
    out = {}
    for start in adj:
        cur, path = start, [start]
        for t in range(1, num_steps + 1):
            h = hashlib.md5(f"w:{seed}:{start}:{t}:{cur}".encode()).hexdigest()
            cur = adj[cur][int(h[:6], 16) % len(adj[cur])]
            path.append(cur)
        out[start] = path
    return out


def _collect(df):
    walks = {}
    for r in df.collect():
        walks.setdefault(r.walk_id, {})[r.step] = r.vid
    return {
        w: [steps[i] for i in range(len(steps))] for w, steps in walks.items()
    }


def test_walks_match_python_oracle(spark):
    pairs = er_graph(n=40, p_inv=5, seed=3)
    sym = edges_df(spark, _sym(pairs))
    got = _collect(random_walks(sym, num_steps=5))
    assert got == _py_walks(pairs, num_steps=5)


def test_walks_are_paths_in_the_graph(spark):
    pairs = er_graph(n=60, p_inv=6, seed=9)
    eset = set(_sym(pairs))
    sym = edges_df(spark, _sym(pairs))
    walks = _collect(random_walks(sym, num_steps=4))
    n_starts = len({u for e in eset for u in e})
    assert len(walks) == n_starts
    for start, path in walks.items():
        assert path[0] == start and len(path) == 5
        for a, b in zip(path, path[1:]):
            assert (a, b) in eset


def test_walks_parallelism_invariant(spark):
    pairs = er_graph(n=50, p_inv=5, seed=11)
    sym = edges_df(spark, _sym(pairs))
    a = _collect(random_walks(sym, num_steps=3))
    b = _collect(random_walks(sym.repartition(13), num_steps=3))
    assert a == b


def test_walks_seed_changes_trajectories(spark):
    pairs = er_graph(n=50, p_inv=4, seed=5)
    sym = edges_df(spark, _sym(pairs))
    a = _collect(random_walks(sym, num_steps=4, seed=1))
    b = _collect(random_walks(sym, num_steps=4, seed=2))
    assert a != b


def test_walks_explicit_starts(spark):
    pairs = [(0, 1), (1, 2), (2, 3)]
    sym = edges_df(spark, _sym(pairs))
    starts = spark.createDataFrame([(1,), (2,)], "vid long")
    walks = _collect(random_walks(sym, num_steps=2, starts=starts))
    assert set(walks) == {1, 2}


def _py_biased_walks(pairs, num_steps, p=1.0, q=0.5, seed=42):
    """Python replay of biased_walks: integer-scaled node2vec weights,
    12-hex md5 threshold, first-cum-exceeds pick over sorted neighbors."""
    w_ret, w_in, w_out = round(10_000 / p), 10_000, round(10_000 / q)
    adj = {}
    for u, v in _sym(pairs):
        adj.setdefault(u, []).append(v)
    for u in adj:
        adj[u].sort()
    out = {}
    for start in adj:
        h = hashlib.md5(f"b:{seed}:{start}:1:{start}".encode()).hexdigest()
        cur = adj[start][int(h[:12], 16) % len(adj[start])]
        prev, path = start, [start, cur]
        for t in range(2, num_steps + 1):
            nbrs = adj[cur]
            ws = [
                w_ret if x == prev
                else (w_in if x in adj[prev] else w_out)
                for x in nbrs
            ]
            h = hashlib.md5(f"b:{seed}:{start}:{t}:{cur}".encode()).hexdigest()
            thr = int(h[:12], 16) % sum(ws)
            cum, pick = 0, -1
            for i, w in enumerate(ws):
                cum += w
                if cum > thr:
                    pick = i
                    break
            prev, cur = cur, nbrs[pick]
            path.append(cur)
        out[start] = path
    return out


def test_biased_walks_match_python_replay(spark):
    from tric_spark.operators.walks import biased_walks

    pairs = er_graph(n=40, p_inv=4, seed=13)
    sym = edges_df(spark, _sym(pairs))
    got = _collect(biased_walks(sym, num_steps=4, p=2.0, q=0.5))
    assert got == _py_biased_walks(pairs, num_steps=4, p=2.0, q=0.5)


def test_biased_walks_are_paths_and_deterministic(spark):
    from tric_spark.operators.walks import biased_walks

    pairs = er_graph(n=50, p_inv=5, seed=21)
    eset = set(_sym(pairs))
    sym = edges_df(spark, _sym(pairs))
    a = _collect(biased_walks(sym, num_steps=3))
    b = _collect(biased_walks(sym.repartition(11), num_steps=3))
    assert a == b
    for start, path in a.items():
        assert path[0] == start and len(path) == 4
        for x, y in zip(path, path[1:]):
            assert (x, y) in eset


def test_biased_walks_q_bias_shifts_distribution(spark):
    """Tiny q (DFS-ish) vs huge q (BFS-ish) must produce different
    corpora on a graph with triangles."""
    from tric_spark.operators.walks import biased_walks

    pairs = er_graph(n=60, p_inv=3, seed=4)
    sym = edges_df(spark, _sym(pairs))
    lo = _collect(biased_walks(sym, num_steps=4, q=0.1))
    hi = _collect(biased_walks(sym, num_steps=4, q=10.0))
    assert lo != hi


def _py_mc_pagerank(pairs, c=0.85, reps=2, max_steps=8, seed=42):
    adj = {}
    for u, v in _sym(pairs):
        adj.setdefault(u, []).append(v)
    for u in adj:
        adj[u].sort()
    cint = round(c * 1_000_000)
    visits = {}
    n_walks = 0
    for start in adj:
        for rep in range(reps):
            n_walks += 1
            cur = start
            visits[cur] = visits.get(cur, 0) + 1
            for t in range(1, max_steps + 1):
                hc = hashlib.md5(
                    f"mcc:{seed}:{start}:{rep}:{t}:{cur}".encode()
                ).hexdigest()
                if int(hc[:6], 16) % 1_000_000 >= cint:
                    break
                hh = hashlib.md5(
                    f"mch:{seed}:{start}:{rep}:{t}:{cur}".encode()
                ).hexdigest()
                cur = adj[cur][int(hh[:6], 16) % len(adj[cur])]
                visits[cur] = visits.get(cur, 0) + 1
    return {
        v: (n, round(n * (1 - c) / n_walks, 6)) for v, n in visits.items()
    }


def test_mc_pagerank_matches_python_replay(spark):
    from tric_spark.operators.walks import mc_pagerank

    pairs = er_graph(n=40, p_inv=4, seed=17)
    sym = edges_df(spark, _sym(pairs))
    got = {
        r.vid: (r.visits, r.rank_est)
        for r in mc_pagerank(sym, max_steps=6).collect()
    }
    assert got == _py_mc_pagerank(pairs, max_steps=6)


def test_mc_pagerank_tracks_exact_pagerank(spark):
    """The MC estimate must rank the clear hub of a star-plus-ring graph
    first, matching power iteration's verdict."""
    from tric_spark.operators.walks import mc_pagerank

    hub = 0
    pairs = [(hub, i) for i in range(1, 13)] + [
        (i, i % 12 + 1) for i in range(1, 13)
    ]
    sym = edges_df(spark, _sym(pairs))
    est = mc_pagerank(sym, walks_per_vertex=4, max_steps=10).collect()
    top = max(est, key=lambda r: r.rank_est)
    assert top.vid == hub


def test_walk_cooccurrence_matches_python_replay(spark):
    from tric_spark.operators.walks import walk_cooccurrence

    pairs = er_graph(n=40, p_inv=4, seed=7)
    sym = edges_df(spark, _sym(pairs))
    num_steps, window = 4, 2
    got = {
        (r.a, r.b): r.cnt
        for r in walk_cooccurrence(sym, num_steps, window).collect()
    }
    trajs = _py_walks(pairs, num_steps)  # {walk_id: [v0..vn]}
    want = {}
    for path in trajs.values():
        for i in range(len(path)):
            for j in range(i + 1, min(i + window, len(path) - 1) + 1):
                if path[i] != path[j]:
                    key = (min(path[i], path[j]), max(path[i], path[j]))
                    want[key] = want.get(key, 0) + 1
    assert got == want and got
