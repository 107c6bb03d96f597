"""Spectral bipartition: numpy trajectory replay + planted-cut recovery."""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import functions as F

from conftest import edges_df
from tric_spark import graph
from tric_spark.operators.spectral import fiedler_vector, spectral_bipartition
from tric_spark.synth import sbm_edges


def _np_fiedler(pairs, n, iters, seed):
    A = np.zeros((n, n))
    for u, v in pairs:
        A[u, v] = A[v, u] = 1.0
    d = A.sum(1)
    keep = d > 0
    idx = np.where(keep)[0]
    Dm = 1.0 / np.sqrt(d[idx])
    N = (A[np.ix_(idx, idx)] * Dm[None, :]) * Dm[:, None]
    v1 = np.sqrt(d[idx])
    v1 /= np.linalg.norm(v1)
    x = np.array(
        [
            int(hashlib.md5(f"spec:{seed}:{v}".encode()).hexdigest()[:12], 16)
            / 16**12
            - 0.5
            for v in idx
        ]
    )
    for _ in range(iters):
        x = (x + N @ x) / 2  # lazy operator: keeps lambda_2 dominant
        x = x - (x @ v1) * v1
        nrm = np.linalg.norm(x)
        x = x / (nrm if nrm else 1.0)
    return dict(zip(idx.tolist(), x.tolist()))


def test_fiedler_matches_numpy_trajectory(spark):
    rng = np.random.default_rng(3)
    pairs = list(
        {(int(a), int(b)) for a, b in rng.integers(0, 30, (80, 2)) if a != b}
    )
    pairs = [(min(a, b), max(a, b)) for a, b in pairs]
    sym = graph.symmetrize(graph.canonical_edges(edges_df(spark, pairs)))
    got = {r["vid"]: r["x"] for r in fiedler_vector(sym, iters=5, seed=42).collect()}
    exp = _np_fiedler(pairs, 30, 5, 42)
    assert set(got) == set(exp)
    for v in got:
        assert abs(got[v] - exp[v]) < 1e-9


def test_bipartition_recovers_two_blocks(spark):
    e = sbm_edges(spark, 80, k=2, d_in=10, d_out=1, seed=4)
    sym = graph.symmetrize(graph.canonical_edges(e.select("src", "dst")))
    sides = {r["vid"]: r["side"] for r in spectral_bipartition(sym, iters=12).collect()}
    agree = sum(1 for v, s in sides.items() if s == (v % 2))
    frac = max(agree, len(sides) - agree) / len(sides)
    assert frac > 0.95  # planted 2-block cut recovered
    assert sides[min(sides)] == 0  # anchor convention


def test_bipartition_path_splits_in_half(spark):
    pairs = [(i, i + 1) for i in range(9)]
    sym = graph.symmetrize(graph.canonical_edges(edges_df(spark, pairs)))
    sides = {r["vid"]: r["side"] for r in spectral_bipartition(sym, iters=40).collect()}
    # the Fiedler vector of a path is monotone: one contiguous block per side
    labels = [sides[i] for i in range(10)]
    assert labels == sorted(labels) or labels == sorted(labels, reverse=True)
    assert 3 <= sum(labels) <= 7


def test_partition_conductance(spark):
    # two triangles joined by one bridge: cut=1 edge (counted twice in
    # the symmetric table), vol(side0)=7, vol(side1)=7
    pairs = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    sym = graph.symmetrize(graph.canonical_edges(edges_df(spark, pairs)))
    labels = spark.createDataFrame(
        [(v, 0 if v < 3 else 1) for v in range(6)], "vid long, side int"
    )
    from tric_spark.operators.spectral import partition_conductance

    rows = {r["side"]: r for r in partition_conductance(sym, labels).collect()}
    for s in (0, 1):
        assert rows[s]["volume"] == 7
        assert rows[s]["cut_edges"] == 1
        assert abs(rows[s]["conductance"] - round(1 / 7, 6)) < 1e-9

    # the spectral cut of a 2-block SBM beats a parity labeling
    e = sbm_edges(spark, 60, k=2, d_in=8, d_out=1, seed=4)
    sym2 = graph.symmetrize(graph.canonical_edges(e.select("src", "dst")))
    spec = spectral_bipartition(sym2, iters=12)
    good = min(
        r["conductance"] for r in partition_conductance(sym2, spec).collect()
    )
    arbitrary = spark.createDataFrame(
        [(v, int(v < 30)) for v in range(60)], "vid long, side int"
    )
    bad = min(
        r["conductance"]
        for r in partition_conductance(sym2, arbitrary).collect()
    )
    assert good < bad
