"""HITS vs a dense numpy power-iteration oracle."""

import numpy as np

from conftest import edges_df
from fixtures import er_graph
from oracles import hits_oracle

from tric_spark.operators.hits import hits


def _run(spark, directed, n, **kw):
    edges = edges_df(spark, directed)
    verts = spark.range(n).withColumnRenamed("id", "vid")
    rows = hits(edges, verts, **kw).collect()
    hub, auth = np.zeros(n), np.zeros(n)
    for r in rows:
        hub[r.vid], auth[r.vid] = r.hub, r.auth
    return hub, auth


def test_hits_vs_numpy_oracle_fixed_iters(spark):
    pairs = er_graph(n=50, p_inv=8)
    # directed: all forward plus a biased subset of reversals, so hub and
    # auth scores genuinely differ per vertex
    directed = [(u, v) for u, v in pairs] + [(v, u) for u, v in pairs if (u + v) % 3]
    hub_o, auth_o = hits_oracle(directed, 50, max_iter=7)
    hub, auth = _run(spark, directed, 50, tol=0.0, max_iter=7)
    assert np.allclose(hub, hub_o, atol=1e-9)
    assert np.allclose(auth, auth_o, atol=1e-9)
    assert abs(np.linalg.norm(hub) - 1.0) < 1e-9
    assert abs(np.linalg.norm(auth) - 1.0) < 1e-9


def test_hits_convergence_mode(spark):
    pairs = er_graph(n=40, p_inv=6, seed=7)
    directed = [(u, v) for u, v in pairs]
    hub_o, auth_o = hits_oracle(directed, 40, tol=1e-9, max_iter=200)
    hub, auth = _run(spark, directed, 40, tol=1e-9, max_iter=200)
    assert np.allclose(hub, hub_o, atol=1e-6)
    assert np.allclose(auth, auth_o, atol=1e-6)


def test_hits_star(spark):
    # star 0→{1..5}: vertex 0 is the only hub, leaves the only authorities
    directed = [(0, i) for i in range(1, 6)]
    hub, auth = _run(spark, directed, 6, tol=0.0, max_iter=3)
    assert abs(hub[0] - 1.0) < 1e-12
    assert np.allclose(hub[1:], 0.0)
    assert abs(auth[0]) < 1e-12
    assert np.allclose(auth[1:], 1.0 / np.sqrt(5))


def test_hits_edgeless_graph_stays_zero(spark):
    # no edges at all: both norms floor to 1.0 → scores go (and stay) 0.0,
    # never NaN
    edges = edges_df(spark, []).limit(0)
    verts = spark.range(4).withColumnRenamed("id", "vid")
    rows = hits(edges, verts, tol=0.0, max_iter=2).collect()
    assert len(rows) == 4
    assert all(r.hub == 0.0 and r.auth == 0.0 for r in rows)
