from collections import defaultdict

from conftest import edges_df
from fixtures import K5, TWO_K4, er_graph

from tric_spark import graph
from tric_spark.operators.kcore import core_numbers, kcore_subgraph


def core_numbers_oracle(pairs):
    """Textbook peeling oracle (pure python)."""
    adj = defaultdict(set)
    for u, v in pairs:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    core = {}
    alive = dict(adj)
    k = 1
    while alive:
        changed = True
        while changed:
            changed = False
            for v in list(alive):
                if len(alive[v]) < k:
                    core[v] = k - 1
                    for u in alive[v]:
                        if u in alive:
                            alive[u].discard(v)
                    del alive[v]
                    changed = True
        k += 1
    return core


def _sym(spark, pairs):
    return graph.symmetrize(graph.canonical_edges(edges_df(spark, pairs)))


def test_kcore_k5(spark):
    sym = _sym(spark, K5)
    assert kcore_subgraph(sym, 4).count() == 20  # K5 is a 4-core (both dirs)
    assert kcore_subgraph(sym, 5).count() == 0


def test_kcore_star_plus_clique(spark):
    # star around 0 (degree-1 leaves) + K4 on {0..3}: 2-core strips leaves
    pairs = TWO_K4[:6] + [(0, 100 + i) for i in range(5)]
    sym = _sym(spark, pairs)
    core2 = kcore_subgraph(sym, 2)
    verts = {r.src for r in core2.collect()}
    assert verts == {0, 1, 2, 3}


def test_core_numbers_vs_oracle(spark):
    pairs = er_graph(n=60, p_inv=6)
    want = core_numbers_oracle(pairs)
    sym = _sym(spark, pairs)
    got = {r.vid: r.core for r in core_numbers(sym).collect()}
    assert got == want


def test_core_numbers_fold_bounds_plan_width(spark):
    """VERDICT r4 #8: the per-wave assignment union is folded into a
    checkpointed accumulator every ``fold_every`` waves, so no plan ever
    unions O(waves) frames. fold_every=1 (fold EVERY wave — the maximal
    bounding) must produce the identical decomposition; the er fixture
    peels in several waves so multiple folds actually execute."""
    pairs = er_graph(n=60, p_inv=6)
    want = core_numbers_oracle(pairs)
    sym = _sym(spark, pairs)
    got = {r.vid: r.core for r in core_numbers(sym, fold_every=1).collect()}
    assert got == want


def test_densest_core_k5_plus_tail(spark):
    from tric_spark.operators.kcore import densest_core

    # K5 (4-core, density 10/5=2.0) + a path tail hanging off vertex 0
    pairs = K5 + [(0, 10), (10, 11), (11, 12)]
    (r,) = densest_core(_sym(spark, pairs)).collect()
    assert (r.k, r.n_vertices, r.n_edges, r.density) == (4, 5, 10, 2.0)


def test_densest_core_matches_python_peel(spark):
    from tric_spark.operators.kcore import densest_core

    pairs = er_graph(n=60, p_inv=4, seed=23)
    core = core_numbers_oracle(pairs)
    kmax = max(core.values())
    cv = {v for v, c in core.items() if c == kmax}
    eset = {tuple(sorted(e)) for e in pairs if e[0] != e[1]}
    ne = sum(1 for a, b in eset if a in cv and b in cv)
    (r,) = densest_core(_sym(spark, pairs)).collect()
    assert (r.k, r.n_vertices, r.n_edges) == (kmax, len(cv), ne)
    assert r.density == round(ne / len(cv), 6)
