import itertools

import pytest

from tests.conftest import edges_df
from tric_spark import graph
from tric_spark.operators import motifs


def _brute_c4(pairs):
    adj = {}
    for u, v in pairs:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    verts = sorted(adj)
    n = 0
    for quad in itertools.combinations(verts, 4):
        # count distinct 4-cycles on this vertex set: each of the 3
        # perfect matchings of the quad into two diagonal pairs gives a
        # candidate cycle; the cycle exists iff the 4 non-diagonal edges do.
        a, b, c, d = quad
        for (p, q), (r, s) in [((a, b), (c, d)), ((a, c), (b, d)), ((a, d), (b, c))]:
            # p-r-q-s-p with diagonals (p,q),(r,s)
            if (
                r in adj[p]
                and q in adj[r]
                and s in adj[q]
                and p in adj[s]
            ):
                n += 1
    return n


def _brute_k4(pairs):
    adj = {}
    for u, v in pairs:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    verts = sorted(adj)
    return sum(
        1
        for quad in itertools.combinations(verts, 4)
        if all(b in adj[a] for a, b in itertools.combinations(quad, 2))
    )


SQUARE = [(0, 1), (1, 2), (2, 3), (3, 0)]
K5 = list(itertools.combinations(range(5), 2))
# square + one diagonal = 2 triangles sharing an edge, still 1 rectangle
DIAMOND = SQUARE + [(0, 2)]


@pytest.mark.parametrize(
    "pairs,want_c4",
    [(SQUARE, 1), (DIAMOND, 1), (K5, 15)],
)
def test_fourcycle_goldens(spark, pairs, want_c4):
    sym = graph.symmetrize(graph.canonical_edges(edges_df(spark, pairs)))
    assert motifs.fourcycle_count(sym) == want_c4 == _brute_c4(pairs)


@pytest.mark.parametrize(
    "pairs,want_k4",
    [(SQUARE, 0), (DIAMOND, 0), (K5, 5)],
)
def test_fourclique_goldens(spark, pairs, want_k4):
    canon = graph.canonical_edges(edges_df(spark, pairs))
    assert motifs.fourclique_count(canon) == want_k4 == _brute_k4(pairs)


def test_motifs_on_karate_both_orientations(spark):
    from tric_spark.sources.binary_csr import read_binary_csr

    canon = graph.canonical_edges(
        read_binary_csr(spark, "/root/reference/karate.bin")
    )
    pairs = [(r.src, r.dst) for r in canon.collect()]
    sym = graph.symmetrize(canon)
    deg = graph.degrees(sym)
    oriented = graph.orient_by_degree(canon, deg)

    want_c4 = _brute_c4(pairs)
    want_k4 = _brute_k4(pairs)
    assert motifs.fourcycle_count(sym) == want_c4
    # count is orientation-invariant: id order and (deg,id) order agree
    assert motifs.fourclique_count(canon) == want_k4
    assert motifs.fourclique_count(oriented, deg=deg) == want_k4


def test_fourcliques_listing_unique(spark):
    canon = graph.canonical_edges(edges_df(spark, K5))
    rows = motifs.fourcliques(canon).collect()
    quads = {tuple(sorted((r.i, r.j, r.k, r.l))) for r in rows}
    assert len(rows) == len(quads) == 5
    # every row is emitted in orientation order
    assert all(r.i < r.j < r.k < r.l for r in rows)
