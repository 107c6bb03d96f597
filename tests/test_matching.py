import hashlib

from conftest import edges_df
from fixtures import er_graph

from tric_spark import graph
from tric_spark.operators.matching import maximal_matching


def _greedy(pairs, seed=42):
    """Sequential greedy matching over md5-priority-sorted edges — the
    unique result the parallel rounds must reproduce."""
    pri = sorted(
        pairs,
        key=lambda e: hashlib.md5(
            f"mm:{seed}:{e[0]}:{e[1]}".encode()
        ).hexdigest(),
    )
    used, out = set(), set()
    for u, v in pri:
        if u not in used and v not in used:
            out.add((u, v))
            used.update((u, v))
    return out


def _run(spark, pairs, **kw):
    canon = graph.canonical_edges(edges_df(spark, pairs))
    return {(r.src, r.dst) for r in maximal_matching(canon, **kw).collect()}


def test_matching_equals_sequential_greedy(spark):
    pairs = er_graph(n=60, p_inv=6, seed=3)
    got = _run(spark, pairs)
    assert got == _greedy(pairs)


def test_matching_is_matching_and_maximal(spark):
    pairs = er_graph(n=50, p_inv=4, seed=8)
    got = _run(spark, pairs)
    used = [v for e in got for v in e]
    assert len(used) == len(set(used))  # no vertex matched twice
    # maximality: every edge touches a matched vertex
    mv = set(used)
    assert all(u in mv or v in mv for u, v in pairs)


def test_fixed_rounds_converge_and_are_stable(spark):
    pairs = er_graph(n=40, p_inv=5, seed=5)
    want = _greedy(pairs)
    assert _run(spark, pairs, rounds=12) == want
    # extra rounds never change a converged matching
    assert _run(spark, pairs, rounds=16) == want


def test_empty_graph(spark):
    canon = graph.canonical_edges(edges_df(spark, [])).limit(0)
    assert maximal_matching(canon).count() == 0
