"""SemDeDup vs a full numpy replay of the deterministic pipeline (md5
centroid pick → cosine assignment → Lloyd refine → within-cell pairs →
CC), plus hand goldens and the oversized-cell guard."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from tric_spark.operators.semdedup import (
    semantic_dedup,
    semantic_dedup_kept,
    semantic_pairs,
)


def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )


def _vecs(n=24, dims=4, seed=3):
    """Deterministic cluster-structured vectors: 4 base directions, small
    per-vector perturbations, plus exact semantic duplicates (ids 0/1 and
    6/7 are near-identical within their clusters)."""
    base = np.eye(dims)
    vecs = []
    for i in range(n):
        b = base[i % dims]
        v = b + 0.05 * np.random.RandomState(seed * 1000 + i).randn(dims)
        vecs.append(v)
    vecs[1] = vecs[0] + 1e-4  # semantic duplicate pair in cluster of 0
    vecs[7] = vecs[6] * 2.0  # scaled copy: cosine exactly 1
    return vecs


def _replay(vecs, threshold, n_centroids, refine):
    """numpy replay of ivf_assignments + semantic_pairs + CC."""
    n = len(vecs)
    order = sorted(range(n), key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    cents = [np.asarray(vecs[i], float) for i in order[:n_centroids]]

    def cos(a, b):
        a, b = np.asarray(a, float), np.asarray(b, float)
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    def assign(cents):
        out = {}
        for i in range(n):
            sims = [(-cos(vecs[i], c), ci + 1) for ci, c in enumerate(cents)]
            out[i] = min(sims)[1]
        return out

    a = assign(cents)
    for _ in range(refine):
        by_cell = {}
        for i, c in a.items():
            by_cell.setdefault(c, []).append(np.asarray(vecs[i], float))
        cents2 = {c: np.mean(vs, axis=0) for c, vs in by_cell.items()}
        ids = sorted(cents2)
        a = {
            i: min((-cos(vecs[i], cents2[c]), c) for c in ids)[1]
            for i in range(n)
        }
    pairs = set()
    for i in range(n):
        for j in range(i + 1, n):
            if a[i] == a[j] and round(cos(vecs[i], vecs[j]), 6) >= threshold:
                pairs.add((i, j))
    # CC closure, rep = min id
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            x = parent[x]
        return x

    for i, j in pairs:
        ri, rj = find(i), find(j)
        if ri != rj:
            parent[max(ri, rj)] = min(ri, rj)
    groups = {}
    for i, j in pairs:
        for x in (i, j):
            groups[x] = find(x)
    return pairs, groups


def test_semantic_pairs_vs_numpy_replay(spark):
    vecs = _vecs()
    df = _emb_df(spark, vecs)
    pairs_o, _ = _replay(vecs, 0.97, n_centroids=4, refine=1)
    got = {
        (r.a, r.b)
        for r in semantic_pairs(df, 0.97, n_centroids=4, refine=1).collect()
    }
    assert got == pairs_o
    assert (0, 1) in got and (6, 7) in got  # the planted duplicates


def test_semantic_dedup_groups_vs_replay(spark):
    vecs = _vecs()
    df = _emb_df(spark, vecs)
    _, groups_o = _replay(vecs, 0.97, n_centroids=4, refine=1)
    got = {
        r.vec_id: r.rep_id
        for r in semantic_dedup(df, 0.97, n_centroids=4, refine=1).collect()
    }
    assert got == groups_o


def test_semantic_dedup_transitive_closure(spark):
    """a~b and b~c but cos(a,c) < τ: one group {a,b,c}, rep = a. Angles
    0°, 10°, 20° with τ = cos(15°): adjacent pairs pass, the ends don't."""
    th = round(float(np.cos(np.radians(15.0))), 6)
    vecs = [
        [np.cos(np.radians(d)), np.sin(np.radians(d))] for d in (0.0, 10.0, 20.0)
    ]
    df = _emb_df(spark, vecs)
    # n_centroids=1 → everything in one cell; no refine needed
    got = {
        r.vec_id: r.rep_id
        for r in semantic_dedup(df, th, n_centroids=1, refine=0).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0}


def test_semantic_dedup_kept_drops_non_reps(spark):
    vecs = _vecs()
    df = _emb_df(spark, vecs)
    groups = {
        r.vec_id: r.rep_id
        for r in semantic_dedup(df, 0.97, n_centroids=4, refine=1).collect()
    }
    dropped = {v for v, rep in groups.items() if v != rep}
    kept = {
        r.vec_id
        for r in semantic_dedup_kept(df, 0.97, n_centroids=4, refine=1).collect()
    }
    assert kept == set(range(len(vecs))) - dropped
    assert dropped  # fixture plants real duplicates


def test_oversized_cell_guard_and_audit(spark):
    vecs = _vecs()
    df = _emb_df(spark, vecs)
    audit = {}
    got = semantic_pairs(
        df, 0.97, n_centroids=1, refine=0, max_cell=2, audit=audit
    ).collect()
    assert got == []  # the single 24-id cell exceeds the cap → skipped
    ov = audit["oversized_cells"].collect()
    assert len(ov) == 1 and ov[0].n_ids == len(vecs)


def test_max_cell_none_opts_out(spark):
    vecs = _vecs()
    df = _emb_df(spark, vecs)
    capped = semantic_pairs(df, 0.97, n_centroids=4, refine=1).collect()
    uncapped = semantic_pairs(
        df, 0.97, n_centroids=4, refine=1, max_cell=None
    ).collect()
    assert {(r.a, r.b) for r in capped} == {(r.a, r.b) for r in uncapped}


def test_semantic_dedup_no_pairs_empty_result(spark):
    # orthogonal unit vectors: no pair passes any positive threshold
    vecs = np.eye(4).tolist()
    df = _emb_df(spark, vecs)
    assert semantic_dedup(df, 0.5, n_centroids=2, refine=0).count() == 0
