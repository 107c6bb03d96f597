"""SBM generator: md5 replay, parallelism invariance, louvain recovery."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from tric_spark import graph
from tric_spark.synth import sbm_edges


def _u48(seed, v, tag, j):
    h = hashlib.md5(f"sbm:{seed}:{v}:{tag}:{j}".encode()).hexdigest()
    return int(h[:12], 16)


def _py_sbm(n, k, d_in, d_out, seed):
    bs = n // k
    out = []
    for v in range(n):
        blk, own = v % k, v // k
        for j in range(d_in):
            m = (own + 1 + _u48(seed, v, "in", j) % (bs - 1)) % bs
            out.append((v, blk + k * m, blk))
        for j in range(d_out):
            r = 1 + _u48(seed, v, "blk", j) % (k - 1)
            m = _u48(seed, v, "out", j) % bs
            out.append((v, (blk + r) % k + k * m, blk))
    return sorted(out)


def test_sbm_matches_python_replay(spark):
    got = sorted(
        tuple(r) for r in sbm_edges(spark, 40, k=4, d_in=3, d_out=2, seed=9).collect()
    )
    assert got == _py_sbm(40, 4, 3, 2, 9)


def test_sbm_no_self_loops_and_block_structure(spark):
    df = sbm_edges(spark, 60, k=3, d_in=4, d_out=1, seed=5)
    assert df.filter(F.col("src") == F.col("dst")).count() == 0
    # intra edges stay in-block for d_in picks: count cross-block edges
    cross = df.filter(F.col("src") % 3 != F.col("dst") % 3).count()
    assert cross == 60  # exactly d_out per vertex
    assert df.count() == 60 * 5


def test_sbm_parallelism_invariance(spark):
    a = sorted(tuple(r) for r in sbm_edges(spark, 36, 3, 2, 1, seed=2).collect())
    b = sorted(
        tuple(r)
        for r in sbm_edges(spark, 36, 3, 2, 1, seed=2)
        .repartition(13)
        .collect()
    )
    assert a == b


def test_sbm_validation(spark):
    with pytest.raises(ValueError):
        sbm_edges(spark, 41, k=4)
    with pytest.raises(ValueError):
        sbm_edges(spark, 4, k=4)


def test_louvain_recovers_planted_blocks(spark):
    from tric_spark.operators.clustereval import cluster_agreement
    from tric_spark.operators.louvain import louvain_move

    e = sbm_edges(spark, 120, k=3, d_in=10, d_out=1, seed=7)
    planted = e.select(
        F.col("src").alias("vid"), F.col("block").alias("label")
    ).distinct()
    sym = graph.symmetrize(graph.canonical_edges(e.select("src", "dst")))
    got = louvain_move(sym, rounds=6).select(
        "vid", F.col("community").alias("label")
    )
    row = cluster_agreement(planted, got).collect()[0]
    # measured 0.8446 with this fixed seed; the whole chain is
    # deterministic, the margin guards float noise only
    assert row["nmi"] > 0.8
    assert row["ari"] > 0.7
