"""End-to-end: pages table → extraction → vertex ids → all four kernels,
verified against numpy oracles on the collected edge list. This is the
full north-rule pipeline on a skewed (power-law) graph."""

import numpy as np
from pyspark.sql import functions as F

from oracles import cc_oracle, lp_oracle, pagerank_oracle, tc_oracle

from tric_spark import graph, synth
from tric_spark.extract import outlink_edges
from tric_spark.operators import tc
from tric_spark.operators.cc import connected_components
from tric_spark.operators.lp import label_propagation
from tric_spark.operators.pagerank import pagerank


def test_full_pipeline_on_powerlaw_graph(spark):
    n = 400
    pages = synth.pages_table(spark, n, seed=42)

    # html → outlinks → urls → xxhash64 vertex ids (the production id path)
    url_edges = outlink_edges(pages)
    ids = graph.assign_vertex_ids(pages.select("url"))
    assert graph.audit_id_collisions(ids) == 0
    edges = (
        url_edges.join(ids.withColumnsRenamed({"url": "src_url", "vid": "src"}), "src_url")
        .join(ids.withColumnsRenamed({"url": "dst_url", "vid": "dst"}), "dst_url")
        .select("src", "dst")
    )

    canon = graph.canonical_edges(edges)
    sym = graph.symmetrize(canon)
    verts = graph.vertices(sym)
    deg = graph.degrees(sym)
    oriented = graph.orient_by_degree(canon, deg)

    # oracle ground truth from the collected edge list (hash-id space)
    pairs = [(r.src, r.dst) for r in canon.collect()]
    vertices = sorted({v for e in pairs for v in e})
    want_tc, want_pv = tc_oracle(pairs)
    assert want_tc > 0

    assert tc.triangle_count_adj(oriented) == want_tc
    assert tc.triangle_count_join(canon) == want_tc
    pv = {r.vid: r.tc for r in tc.triangles_per_vertex_adj(oriented).collect()}
    assert pv == want_pv

    got_cc = {r.vid: r.comp for r in connected_components(sym, verts).collect()}
    assert got_cc == cc_oracle(pairs, vertices)

    got_lp = {r.vid: r.label for r in label_propagation(sym, verts, num_iter=2).collect()}
    assert got_lp == lp_oracle(pairs, vertices, 2)

    # PageRank over the symmetric graph vs dense oracle (remap to 0..n-1)
    remap = {v: i for i, v in enumerate(vertices)}
    directed = [(remap[u], remap[v]) for u, v in pairs] + [
        (remap[v], remap[u]) for u, v in pairs
    ]
    oracle_r = pagerank_oracle(directed, len(vertices))
    got_r = {r.vid: r.rank for r in pagerank(sym, verts).collect()}
    got_arr = np.array([got_r[v] for v in vertices])
    assert np.allclose(got_arr, oracle_r, atol=1e-6)
