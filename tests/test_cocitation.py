"""Co-citation / coupling vs a brute-force python oracle."""

from collections import defaultdict
from itertools import combinations

from conftest import edges_df
from fixtures import er_graph

from tric_spark.operators.cocitation import (
    cocitation_pairs,
    coupling_pairs,
    related_pages_topk,
)


def _directed(seed=3):
    pairs = er_graph(n=40, p_inv=5, seed=seed)
    return [(u, v) for u, v in pairs] + [(v, u) for u, v in pairs if (u + v) % 2]


def _oracle(directed, pivot_of, leaf_of, min_common):
    by_pivot = defaultdict(set)
    for e in directed:
        by_pivot[pivot_of(e)].add(leaf_of(e))
    counts = defaultdict(int)
    for leaves in by_pivot.values():
        for a, b in combinations(sorted(leaves), 2):
            counts[(a, b)] += 1
    return {p: c for p, c in counts.items() if c >= min_common}


def test_cocitation_vs_oracle(spark):
    directed = _directed()
    want = _oracle(directed, lambda e: e[0], lambda e: e[1], min_common=2)
    got = {
        (r.a, r.b): r.common
        for r in cocitation_pairs(edges_df(spark, directed), min_common=2).collect()
    }
    assert got == want


def test_coupling_vs_oracle(spark):
    directed = _directed(seed=9)
    want = _oracle(directed, lambda e: e[1], lambda e: e[0], min_common=2)
    got = {
        (r.a, r.b): r.common
        for r in coupling_pairs(edges_df(spark, directed), min_common=2).collect()
    }
    assert got == want


def test_fanout_guard_excludes_superhub(spark):
    # hub 0 cites everything; pages 1 and 2 are also co-cited by 10 and 11
    directed = [(0, i) for i in range(1, 8)] + [(10, 1), (10, 2), (11, 1), (11, 2)]
    edges = edges_df(spark, directed)
    # guard at 5: hub 0 (fan-out 7) is excluded, the honest co-citers remain
    got = {
        (r.a, r.b): r.common
        for r in cocitation_pairs(edges, min_common=2, max_fanout=5).collect()
    }
    assert got == {(1, 2): 2}
    # opt-out: the hub's C(7,2) pairs reappear
    # hub wedges = C(7,2) = 21 distinct pairs; (1,2) merges into one of them
    all_pairs = cocitation_pairs(edges, min_common=1, max_fanout=None).count()
    assert all_pairs == 21


def test_related_pages_topk_deterministic_ties(spark):
    # 1 is co-cited equally with 2 and 3 → ties broken by related id
    directed = [(9, 1), (9, 2), (9, 3), (8, 1), (8, 2), (8, 3)]
    rows = related_pages_topk(
        edges_df(spark, directed), k=1, min_common=2
    ).collect()
    top = {r.vid: r.related for r in rows}
    assert top[1] == 2  # 2 < 3 wins the tie
    assert top[2] == 1 and top[3] == 1
