"""True RGG source vs a numpy brute-force oracle (reference GenerateRGG,
graph.hpp:626-1258: unit square, radius rn_, -p% random extra edges)."""

import numpy as np
from pyspark.sql import functions as F

from tric_spark import graph, synth
from tric_spark.operators import tc


def _numpy_rgg(points, r):
    ids = np.array([p.vid for p in points])
    xy = np.array([[p.x, p.y] for p in points])
    d2 = ((xy[:, None, :] - xy[None, :, :]) ** 2).sum(-1)
    iu, ju = np.triu_indices(len(ids), k=1)
    keep = d2[iu, ju] <= r * r
    return {(int(ids[i]), int(ids[j])) for i, j in zip(iu[keep], ju[keep])}


def test_rgg_edges_match_numpy_oracle(spark):
    n = 300
    r = synth.rgg_default_radius(n)
    pts = synth.rgg_points(spark, n).collect()
    want = _numpy_rgg(pts, r)
    got = {(r_.src, r_.dst) for r_ in synth.rgg_edges(spark, n).collect()}
    assert got == want
    assert len(want) > n  # connectivity-radius RGG: avg degree > 2


def test_rgg_triangles_match_oracle(spark):
    from oracles import tc_oracle

    n = 300
    edges = synth.rgg_edges(spark, n).select("src", "dst")
    pairs = [(r.src, r.dst) for r in edges.collect()]
    total, _ = tc_oracle(pairs)
    canon = graph.canonical_edges(edges)
    deg = graph.degrees(graph.symmetrize(canon))
    assert tc.triangle_count_adj(graph.orient_by_degree(canon, deg)) == total
    assert total > 0  # geometric graphs are triangle-rich


def test_rgg_extra_edges_and_weights(spark):
    n = 400
    base = synth.rgg_edges(spark, n).count()
    withx = synth.rgg_edges(spark, n, extra_edge_pct=10.0)
    n_extra = withx.count() - base
    assert 0 < n_extra <= int(10.0 * n / 100)  # minus self-loops/dup collisions
    # euclidean weights are the actual distances, bounded by the radius
    ew = synth.rgg_edges(spark, n, unit_weight=False)
    r = synth.rgg_default_radius(n)
    bad = ew.filter((F.col("weight") <= 0) | (F.col("weight") > r)).count()
    assert bad == 0
    assert synth.rgg_edges(spark, n).filter(F.col("weight") != 1.0).count() == 0
    # ADVICE r2: extra-edge weights live in the OPEN interval (0,1) like the
    # reference's unif(0,1) draw — exactly-0.0 must be unreachable
    extras = withx.filter(F.col("weight") != 1.0)
    assert extras.count() == n_extra
    assert extras.filter((F.col("weight") <= 0) | (F.col("weight") >= 1)).count() == 0


def test_rgg_determinism_across_parallelism(spark):
    a = synth.rgg_edges(spark, 200).repartition(2).orderBy("src", "dst").collect()
    b = synth.rgg_edges(spark, 200).repartition(16).orderBy("src", "dst").collect()
    assert a == b


def test_rgg_cc_and_pagerank_cross_family(spark):
    """Kernel diversity on a second graph family: CC on a geometric graph
    (many small components at sub-connectivity radius) matches the python
    oracle — the kernels aren't overfit to the Zipf web-graph fixtures."""
    from oracles import cc_oracle

    from tric_spark.operators.cc import connected_components

    n = 300
    r = synth.rgg_default_radius(n) * 0.6  # below connectivity → fragments
    edges = synth.rgg_edges(spark, n, radius=r).select("src", "dst")
    pairs = [(x.src, x.dst) for x in edges.collect()]
    sym = graph.symmetrize(graph.canonical_edges(edges))
    verts = graph.vertices(sym)
    want = cc_oracle(pairs, {x.vid for x in verts.collect()})
    got = {x.vid: x.comp for x in connected_components(sym, verts).collect()}
    assert got == want
    n_comps = len(set(want.values()))
    assert n_comps > 3  # genuinely fragmented at 0.6×r_conn


# --- R-MAT generator ----------------------------------------------------------

def test_rmat_matches_python_replay(spark):
    import hashlib

    from tric_spark.synth import rmat_edges

    n_edges, scale, seed = 400, 6, 42
    a, b, c = 0.57, 0.19, 0.19
    got = sorted(
        (r.src, r.dst) for r in rmat_edges(spark, n_edges, scale, seed=seed).collect()
    )

    def edge(i):
        s = d = 0
        for lvl in range(scale):
            h = hashlib.md5(f"rmat:{seed}:{i}:{lvl // 5}".encode()).hexdigest()
            off = 6 * (lvl % 5)
            u = int(h[off : off + 6], 16) / float(16**6)
            if u >= a + b:
                s += 1 << lvl
            if (a <= u < a + b) or (u >= a + b + c):
                d += 1 << lvl
        return (s, d)

    assert got == sorted(edge(i) for i in range(n_edges))


def test_rmat_parallelism_invariant_and_bounded(spark):
    from tric_spark.synth import rmat_edges

    x = sorted((r.src, r.dst) for r in rmat_edges(spark, 500, 8).collect())
    y = sorted(
        (r.src, r.dst)
        for r in rmat_edges(spark, 500, 8).repartition(17).collect()
    )
    assert x == y
    assert all(0 <= s < 256 and 0 <= d < 256 for s, d in x)


def test_rmat_is_skewed(spark):
    """a=0.57 concentrates mass toward low ids: the max out-degree must be
    far above the mean (the hub shape the generator exists to produce)."""
    from collections import Counter

    from tric_spark.synth import rmat_edges

    rows = rmat_edges(spark, 3000, 8).collect()
    deg = Counter(r.src for r in rows)
    mean = 3000 / len(deg)
    assert max(deg.values()) > 5 * mean
