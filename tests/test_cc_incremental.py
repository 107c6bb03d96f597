"""cc_incremental: delta labeling equals the from-scratch recompute."""

from conftest import edges_df
from fixtures import er_graph

from tric_spark import graph
from tric_spark.operators.cc import cc_incremental, connected_components


def _full_labels(spark, pairs):
    canon = graph.canonical_edges(edges_df(spark, pairs))
    sym = graph.symmetrize(canon)
    return connected_components(sym, graph.vertices(sym))


def _labels_map(df):
    return {r["vid"]: r["comp"] for r in df.collect()}


def test_incremental_matches_recompute_er(spark):
    # sparse ER graph (many components); drop every 4th canonical edge,
    # label, then fold the rest back in — must equal the recompute
    pairs = er_graph(60, 30)
    canon = graph.canonical_edges(edges_df(spark, pairs))
    from pyspark.sql import functions as F

    keep = (F.col("src") + F.col("dst")) % 4 != 0
    old_sym = graph.symmetrize(canon.filter(keep))
    verts = graph.vertices(graph.symmetrize(canon))
    prev = connected_components(old_sym, verts)
    got = _labels_map(cc_incremental(prev, canon.filter(~keep)))
    want = _labels_map(_full_labels(spark, pairs))
    assert got == want


def test_incremental_bridges_components(spark):
    # two components 0-1-2, 10-11; the new edge (2,10) merges them
    prev_pairs = [(0, 1), (1, 2), (10, 11)]
    prev = _full_labels(spark, prev_pairs)
    new = edges_df(spark, [(2, 10)])
    got = _labels_map(cc_incremental(prev, new))
    assert got == {0: 0, 1: 0, 2: 0, 10: 0, 11: 0}


def test_incremental_new_vertices_and_chained_merge(spark):
    # new edges introduce unseen vertices 20, 21 AND chain two old
    # components through them: 0-..-2  2-20  20-21  21-10 -> all comp 0
    prev = _full_labels(spark, [(0, 1), (1, 2), (10, 11), (5, 6)])
    new = edges_df(spark, [(2, 20), (20, 21), (21, 10)])
    got = _labels_map(cc_incremental(prev, new))
    assert got == {0: 0, 1: 0, 2: 0, 10: 0, 11: 0, 20: 0, 21: 0, 5: 5, 6: 5}


def test_incremental_noop_edges(spark):
    # new edges entirely inside one existing component: labels unchanged
    prev = _full_labels(spark, [(0, 1), (1, 2), (10, 11)])
    got = _labels_map(cc_incremental(prev, edges_df(spark, [(0, 2)])))
    assert got == {0: 0, 1: 0, 2: 0, 10: 10, 11: 10}


def test_incremental_composes_across_days(spark):
    # day-1 delta then day-2 delta == one-shot recompute of everything
    base = [(0, 1), (4, 5), (8, 9)]
    d1 = [(1, 4)]
    d2 = [(5, 8), (12, 13)]
    lab1 = cc_incremental(_full_labels(spark, base), edges_df(spark, d1))
    lab2 = cc_incremental(lab1, edges_df(spark, d2))
    assert _labels_map(lab2) == _labels_map(_full_labels(spark, base + d1 + d2))
