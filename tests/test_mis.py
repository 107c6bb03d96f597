"""Luby MIS: independence + maximality on random graphs, python replay
equality (same md5 priorities), determinism across parallelism, seeds."""

import hashlib

from conftest import edges_df
from fixtures import er_graph

from tric_spark.operators.mis import maximal_independent_set


def _sym(spark, pairs):
    both = [(u, v) for u, v in pairs] + [(v, u) for u, v in pairs]
    return edges_df(spark, both)


def _replay(pairs, n, seed=42):
    adj = {v: set() for v in range(n)}
    for u, v in pairs:
        adj[u].add(v)
        adj[v].add(u)
    active = set(range(n))
    mis = set()
    rnd = 0
    while active:
        pri = {
            v: hashlib.md5(f"mis:{seed}:{rnd}:{v}".encode()).hexdigest()
            for v in active
        }
        win = {
            v
            for v in active
            if all(pri[v] < pri[u] for u in adj[v] if u in active)
        }
        mis |= win
        removed = set(win)
        for v in win:
            removed |= adj[v] & active
        active -= removed
        rnd += 1
    return mis


def _run(spark, pairs, n, **kw):
    verts = spark.range(n).withColumnRenamed("id", "vid")
    return {
        r.vid
        for r in maximal_independent_set(_sym(spark, pairs), verts, **kw).collect()
    }


def _check_mis(pairs, n, mis):
    adj = {v: set() for v in range(n)}
    for u, v in pairs:
        adj[u].add(v)
        adj[v].add(u)
    for v in mis:  # independence
        assert not (adj[v] & mis), f"edge inside MIS at {v}"
    for v in set(range(n)) - mis:  # maximality
        assert adj[v] & mis, f"{v} could be added"


def test_mis_matches_python_replay(spark):
    pairs = er_graph(n=40, p_inv=4, seed=23)
    got = _run(spark, pairs, 40)
    assert got == _replay(pairs, 40)
    _check_mis(pairs, 40, got)


def test_mis_valid_on_denser_graph(spark):
    pairs = er_graph(n=60, p_inv=2, seed=31)
    got = _run(spark, pairs, 60)
    _check_mis(pairs, 60, got)
    assert got == _replay(pairs, 60)


def test_mis_parallelism_invariant(spark):
    pairs = er_graph(n=40, p_inv=4, seed=23)
    verts = spark.range(40).withColumnRenamed("id", "vid")
    sym = _sym(spark, pairs)
    a = {r.vid for r in maximal_independent_set(sym, verts).collect()}
    b = {
        r.vid
        for r in maximal_independent_set(
            sym.repartition(13), verts.repartition(7)
        ).collect()
    }
    assert a == b


def test_mis_seed_changes_set_validity_holds(spark):
    pairs = er_graph(n=40, p_inv=4, seed=23)
    a = _run(spark, pairs, 40, seed=1)
    _check_mis(pairs, 40, a)
    assert a == _replay(pairs, 40, seed=1)


def test_mis_edgeless_is_everything(spark):
    e = edges_df(spark, []).limit(0)
    verts = spark.range(5).withColumnRenamed("id", "vid")
    assert {r.vid for r in maximal_independent_set(e, verts).collect()} == set(
        range(5)
    )


# --- Jones–Plassmann coloring ------------------------------------------------

from tric_spark.operators.mis import jones_plassmann_coloring  # noqa: E402


def _jp_replay(pairs, n, seed=42):
    adj = {v: set() for v in range(n)}
    for u, v in pairs:
        adj[u].add(v)
        adj[v].add(u)
    pri = {
        v: hashlib.md5(f"col:{seed}:{v}".encode()).hexdigest() for v in range(n)
    }
    color = {}
    while len(color) < n:
        ready = [
            v
            for v in range(n)
            if v not in color
            and all(pri[v] < pri[u] for u in adj[v] if u not in color)
        ]
        for v in ready:
            used = {color[u] for u in adj[v] if u in color}
            c = 0
            while c in used:
                c += 1
            color[v] = c
    return color


def _check_coloring(pairs, n, color):
    assert set(color) == set(range(n))
    for u, v in pairs:
        if u != v:
            assert color[u] != color[v], f"edge {u}-{v} monochromatic"


def test_coloring_matches_python_replay(spark):
    pairs = er_graph(n=40, p_inv=4, seed=29)
    verts = spark.range(40).withColumnRenamed("id", "vid")
    got = {
        r.vid: r.color
        for r in jones_plassmann_coloring(_sym(spark, pairs), verts).collect()
    }
    assert got == _jp_replay(pairs, 40)
    _check_coloring(pairs, 40, got)


def test_coloring_proper_and_bounded_on_denser_graph(spark):
    pairs = er_graph(n=50, p_inv=2, seed=37)
    verts = spark.range(50).withColumnRenamed("id", "vid")
    got = {
        r.vid: r.color
        for r in jones_plassmann_coloring(_sym(spark, pairs), verts).collect()
    }
    _check_coloring(pairs, 50, got)
    deg = {}
    for u, v in pairs:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    assert max(got.values()) <= max(deg.values())  # ≤ Δ+1 colors (0-based)
    assert got == _jp_replay(pairs, 50)


def test_coloring_edgeless_all_zero(spark):
    e = edges_df(spark, []).limit(0)
    verts = spark.range(4).withColumnRenamed("id", "vid")
    rows = jones_plassmann_coloring(e, verts).collect()
    assert {r.vid: r.color for r in rows} == {v: 0 for v in range(4)}
