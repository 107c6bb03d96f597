"""Batch multi-seed PPR: each set must equal the single-set numpy oracle
(and the engine's own single-set kernel) on the SAME trajectory."""

import numpy as np
import pytest

from conftest import edges_df
from fixtures import er_graph
from oracles import ppr_oracle

from tric_spark.operators.mppr import multi_personalized_pagerank


def _setup(spark, n=40, seed=19):
    pairs = er_graph(n=n, p_inv=5, seed=seed)
    directed = [(u, v) for u, v in pairs] + [(v, u) for u, v in pairs if (u + v) % 3]
    edges = edges_df(spark, directed)
    verts = spark.range(n).withColumnRenamed("id", "vid")
    return directed, edges, verts


SETS = {0: [0, 7, 14], 1: [3], 2: [5, 25]}


def _seed_df(spark):
    rows = [(s, v) for s, vs in SETS.items() for v in vs]
    return spark.createDataFrame(rows, "set_id long, vid long")


def test_each_set_matches_numpy_oracle(spark):
    directed, edges, verts = _setup(spark)
    got = multi_personalized_pagerank(
        edges, verts, _seed_df(spark), tol=0.0, max_iter=3
    ).collect()
    per = {}
    for r in got:
        per.setdefault(r.set_id, np.zeros(40))[r.vid] = r.rank
    for sid, seeds in SETS.items():
        # ppr_oracle runs max_iter steps from r=e — the same trajectory
        expect = ppr_oracle(directed, 40, seeds, tol=0, max_iter=3)
        assert np.allclose(per[sid], expect, atol=1e-12), f"set {sid}"


def test_matches_single_set_kernel(spark):
    from tric_spark.operators.pagerank import personalized_pagerank

    directed, edges, verts = _setup(spark, seed=7)
    got = multi_personalized_pagerank(
        edges, verts, _seed_df(spark), tol=0.0, max_iter=2
    ).collect()
    per = {}
    for r in got:
        per.setdefault(r.set_id, {})[r.vid] = r.rank
    for sid, seeds in SETS.items():
        src = spark.createDataFrame([(v,) for v in seeds], "vid long")
        single = {
            r.vid: r.rank
            for r in personalized_pagerank(
                edges, verts, src, tol=0.0, max_iter=2
            ).collect()
        }
        for v in range(40):
            assert per[sid][v] == pytest.approx(single[v], abs=1e-12)


def test_mass_conservation_per_set(spark):
    _, edges, verts = _setup(spark, seed=11)
    got = multi_personalized_pagerank(
        edges, verts, _seed_df(spark), tol=0.0, max_iter=4
    ).collect()
    totals = {}
    for r in got:
        totals[r.set_id] = totals.get(r.set_id, 0.0) + r.rank
    for sid, t in totals.items():
        assert t == pytest.approx(1.0, abs=1e-9), f"set {sid} leaked mass"


def test_empty_seed_sets_raise(spark):
    _, edges, verts = _setup(spark)
    empty = _seed_df(spark).filter("set_id < 0")
    with pytest.raises(ValueError):
        multi_personalized_pagerank(edges, verts, empty)
