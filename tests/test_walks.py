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
