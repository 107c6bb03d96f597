"""r6 optimization invariants: every size-gated fast path must produce
output IDENTICAL to the always-distributed path it replaces.

Three gates were added in the optimization round:
- maximal_matching's bounded local greedy finish (local_cutover),
- cc.components_of_pairs' bounded union-find closure (local_cutover),
- hyper_anf's gather-form hop (broadcast_state_max_rows).

Each test runs both arms of the gate on the same deterministic input and
asserts row-set equality — the determinism arguments in the operator
docstrings, pinned.
"""

import random

from pyspark.sql import functions as F

from tric_spark import graph
from tric_spark.operators.anf import hyper_anf
from tric_spark.operators.cc import components_of_pairs
from tric_spark.operators.matching import maximal_matching


def _rand_edges(n, m, seed):
    rng = random.Random(seed)
    seen = set()
    while len(seen) < m:
        u, v = rng.randrange(n), rng.randrange(n)
        if u != v:
            seen.add((min(u, v), max(u, v)))
    return sorted(seen)


def test_matching_local_finish_matches_distributed(spark):
    # cutover triggers immediately (all 60 edges under the gate), so the
    # ENTIRE matching runs through the local path in one arm
    canon = spark.createDataFrame(
        _rand_edges(40, 60, seed=7), "src long, dst long"
    )
    local = {(r.src, r.dst) for r in maximal_matching(canon).collect()}
    dist = {
        (r.src, r.dst)
        for r in maximal_matching(canon, local_cutover=None).collect()
    }
    assert local == dist and len(local) > 0


def test_matching_mid_run_cutover_matches(spark):
    # larger graph with a small cutover: a few parallel rounds run first,
    # then the tail finishes locally — still the same unique greedy matching
    canon = spark.createDataFrame(
        _rand_edges(300, 900, seed=11), "src long, dst long"
    )
    mixed = {
        (r.src, r.dst)
        for r in maximal_matching(canon, local_cutover=100).collect()
    }
    dist = {
        (r.src, r.dst)
        for r in maximal_matching(canon, local_cutover=None).collect()
    }
    assert mixed == dist


def test_components_of_pairs_local_matches_distributed(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8), (9, 7), (20, 21)], "a long, b long"
    )
    local = {
        (r.vid, r.comp) for r in components_of_pairs(pairs).collect()
    }
    dist = {
        (r.vid, r.comp)
        for r in components_of_pairs(pairs, local_cutover=None).collect()
    }
    assert local == dist
    # min-vid labels, groups as expected
    assert local == {
        (1, 1), (2, 1), (3, 1), (7, 7), (8, 7), (9, 7), (20, 20), (21, 20)
    }


def test_anf_gather_matches_scatter(spark):
    canon = graph.canonical_edges(
        spark.createDataFrame(_rand_edges(60, 120, seed=3), "src long, dst long")
    )
    sym = graph.symmetrize(canon)
    verts = graph.vertices(sym)
    gather = {
        (r.h, r.nf)
        for r in hyper_anf(sym, verts, max_h=4).collect()
    }
    scatter = {
        (r.h, r.nf)
        for r in hyper_anf(
            sym, verts, max_h=4, broadcast_state_max_rows=0
        ).collect()
    }
    assert gather == scatter and len(gather) == 5
