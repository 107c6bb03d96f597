"""Host-graph rollup: host extraction, collapse semantics, host PageRank
mass conservation, and a hand-checked 3-host golden."""

import pytest

from tric_spark.operators.hostgraph import (
    collapse_edges,
    host_edges,
    host_of,
    host_pagerank,
)

from pyspark.sql import functions as F


def test_host_of_extraction(spark):
    df = spark.createDataFrame(
        [
            ("https://site5.example/p/3",),
            ("http://a.b.c/x?y=1",),
            ("ftp://nope/x",),
            ("relative/path",),
        ],
        "url string",
    )
    got = [r.h for r in df.select(host_of("url").alias("h")).collect()]
    assert got == ["site5.example", "a.b.c", "", ""]


def _mapping(spark, pairs):
    return spark.createDataFrame(
        [(int(v), g) for v, g in pairs], "vid long, grp string"
    )


def test_collapse_edges_counts_and_intra(spark):
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (2, 0), (3, 0), (1, 0)],
        "src long, dst long",
    )
    groups = _mapping(spark, [(0, "a"), (1, "a"), (2, "b"), (3, "b")])
    got = {
        (r.src_grp, r.dst_grp): r.n_links
        for r in collapse_edges(edges, groups).collect()
    }
    # intra-host (0→1, 1→0) dropped; a→b: 0→2 and 1→2; b→a: 2→0 and 3→0
    assert got == {("a", "b"): 2, ("b", "a"): 2}
    with_intra = {
        (r.src_grp, r.dst_grp): r.n_links
        for r in collapse_edges(edges, groups, drop_intra=False).collect()
    }
    assert with_intra[("a", "a")] == 2


def test_host_edges_from_urls(spark):
    rows = [
        ("https://x.com/1", "https://y.com/a"),
        ("https://x.com/2", "https://y.com/b"),
        ("https://x.com/1", "https://x.com/3"),
        ("https://y.com/a", "https://x.com/1"),
    ]
    df = spark.createDataFrame(rows, "src_url string, dst_url string")
    got = {(r.src_host, r.dst_host): r.n_links for r in host_edges(df).collect()}
    assert got == {("x.com", "y.com"): 2, ("y.com", "x.com"): 1}


def test_host_pagerank_three_host_golden(spark):
    # a→b (2 links), a→c (1 link), b→a (1), c dangling
    he = spark.createDataFrame(
        [("a", "b", 2), ("a", "c", 1), ("b", "a", 1)],
        "src_host string, dst_host string, n_links long",
    )
    hosts = spark.createDataFrame([("a",), ("b",), ("c",)], "vid string")
    r = {x.vid: x.rank for x in host_pagerank(he, hosts, tol=1e-12, max_iter=200).collect()}
    assert abs(sum(r.values()) - 1.0) < 1e-9  # dangling mass conserved
    # python fixpoint oracle with uniform dangling redistribution
    n, d = 3, 0.85
    pr = {h: 1 / n for h in "abc"}
    for _ in range(500):
        dm = pr["c"]
        base = (1 - d) / n + d * dm / n
        pr = {
            "a": base + d * pr["b"],
            "b": base + d * pr["a"] * (2 / 3),
            "c": base + d * pr["a"] * (1 / 3),
        }
    for h in "abc":
        assert r[h] == pytest.approx(pr[h], abs=1e-9)


def test_host_pagerank_weights_matter(spark):
    he = spark.createDataFrame(
        [("a", "b", 9), ("a", "c", 1), ("b", "a", 1), ("c", "a", 1)],
        "src_host string, dst_host string, n_links long",
    )
    hosts = spark.createDataFrame([("a",), ("b",), ("c",)], "vid string")
    r = {x.vid: x.rank for x in host_pagerank(he, hosts, tol=1e-10, max_iter=100).collect()}
    assert r["b"] > r["c"]  # 9× the links → more rank


def test_pipeline_hostgraph_end_to_end(spark):
    """pages_table urls → outlink_edges → host graph: hosts are the
    synthetic site{0..999}.example set, intra-host links dropped."""
    from tric_spark.extract import outlink_edges
    from tric_spark.synth import pages_table

    pages = pages_table(spark, 300, seed=7)
    he = host_edges(outlink_edges(pages))
    rows = he.collect()
    assert rows
    assert all(r.src_host != r.dst_host for r in rows)
    assert all(
        r.src_host.startswith("site") and r.src_host.endswith(".example")
        for r in rows
    )
    total = he.agg(F.sum("n_links")).collect()[0][0]
    assert total > 0


def test_intra_host_share(spark):
    from tric_spark.operators.hostgraph import intra_host_share

    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 3), (3, 0)], "src long, dst long"
    )
    groups = spark.createDataFrame(
        [(0, "a"), (1, "a"), (2, "b"), (3, "a")], "vid long, grp string"
    )
    r = intra_host_share(edges, groups).collect()[0]
    # intra: 0->1, 1->3, 3->0 ; inter: 0->2
    assert (r.n_intra, r.n_inter, r.intra_share) == (3, 1, 0.75)
