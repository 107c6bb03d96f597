"""Lloyd k-means vs a numpy referee replaying the SAME trajectory (same
md5 init, same rounded-distance argmin, same rounded-mean update) — the
trajectory-replay pattern from test_trustrank (6× faster than fixpoint
tests per CLAUDE.md lore)."""

import hashlib

import numpy as np
import pytest

from tric_spark.operators.kmeans import kmeans, kmeans_summary


def _vecs(n=60, dim=5, seed=3):
    rng = np.random.RandomState(seed)
    return {i: rng.randn(dim).round(3) for i in range(n)}


def _df(spark, vecs):
    rows = [(int(i), [float(x) for x in v]) for i, v in vecs.items()]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _replay(vecs, k, iters, seed=42):
    """Python referee: identical init / rounding / tie-break trajectory."""
    order = sorted(
        vecs, key=lambda i: (hashlib.md5(f"km:{seed}:{i}".encode()).hexdigest(), i)
    )
    cen = {c + 1: np.array(vecs[order[c]], dtype=float) for c in range(k)}

    def assign():
        out = {}
        for i, v in vecs.items():
            best = min(
                (round(float(((v - c) ** 2).sum()), 6), cid)
                for cid, c in cen.items()
            )
            out[i] = (best[1], best[0])
        return out

    for _ in range(iters):
        a = assign()
        nxt = {}
        for cid in cen:
            members = [vecs[i] for i, (c, _) in a.items() if c == cid]
            if members:
                nxt[cid] = np.round(np.mean(members, axis=0), 6)
        cen = nxt
    return assign(), cen


@pytest.mark.parametrize("k,iters", [(4, 3), (7, 2)])
def test_kmeans_matches_replay(spark, k, iters):
    vecs = _vecs()
    assign, centroids = kmeans(_df(spark, vecs), k=k, iters=iters)
    want_a, want_c = _replay(vecs, k, iters)
    got_a = {r.vid: (r.cluster, r.d) for r in assign.collect()}
    assert got_a == want_a
    got_c = {r.cluster: tuple(r.c) for r in centroids.collect()}
    assert got_c == {cid: tuple(c) for cid, c in want_c.items()}


def test_kmeans_summary_totals(spark):
    vecs = _vecs(n=40, dim=4, seed=9)
    assign, _ = kmeans(_df(spark, vecs), k=3, iters=2)
    rows = kmeans_summary(assign).collect()
    assert sum(r.n for r in rows) == 40
    want_a, _ = _replay(vecs, 3, 2)
    for r in rows:
        members = [d for (c, d) in want_a.values() if c == r.cluster]
        assert r.n == len(members)
        assert r.inertia == round(sum(members), 6)


def test_kmeans_empty_cluster_drops(spark):
    # two far-apart blobs, k=3: one seeded centroid goes empty and drops
    vecs = {i: np.array([0.0 + i * 0.01, 0.0]) for i in range(5)}
    vecs.update({i: np.array([100.0 + i * 0.01, 0.0]) for i in range(5, 10)})
    assign, cen = kmeans(_df(spark, vecs), k=3, iters=3)
    want_a, want_c = _replay(vecs, 3, 3)
    assert {r.vid: (r.cluster, r.d) for r in assign.collect()} == want_a
    assert {r.cluster for r in cen.collect()} == set(want_c)


def test_kmeans_parallelism_invariant(spark):
    vecs = _vecs(n=50, dim=6, seed=17)
    a = {
        (r.vid, r.cluster)
        for r in kmeans(_df(spark, vecs), k=5, iters=2)[0].collect()
    }
    b = {
        (r.vid, r.cluster)
        for r in kmeans(_df(spark, vecs).repartition(13), k=5, iters=2)[0].collect()
    }
    assert a == b
