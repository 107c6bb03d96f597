"""Edge-list text source/sink round-trips (SNAP-style # comments,
distributed part-files) and the bounded GraphML export."""

import glob
import os
import xml.etree.ElementTree as ET

import pytest

from tric_spark.sources.edgelist import (
    read_edge_list,
    write_edge_list,
    write_graphml,
)


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


PAIRS = [(0, 1), (1, 2), (2, 0), (5, 9), (9, 5), (1000000007, 3)]


def test_edge_list_roundtrip(spark, tmp_path):
    path = str(tmp_path / "el")
    write_edge_list(_edges(spark, PAIRS), path)
    back = read_edge_list(spark, path)
    assert back.schema.simpleString() == "struct<src:bigint,dst:bigint>"
    assert sorted((r.src, r.dst) for r in back.collect()) == sorted(PAIRS)
    # distributed: part files, not one blob
    assert glob.glob(os.path.join(path, "part-*"))


def test_edge_list_comments_skipped(spark, tmp_path):
    path = str(tmp_path / "el2")
    write_edge_list(
        _edges(spark, PAIRS), path, comments=["Nodes: 6 Edges: 6", "karate"]
    )
    # header lines landed in the directory...
    txt = ""
    for f in glob.glob(os.path.join(path, "part-*")):
        with open(f) as fh:
            txt += fh.read()
    assert "# Nodes: 6 Edges: 6" in txt
    # ...and the reader drops them
    back = read_edge_list(spark, path)
    assert sorted((r.src, r.dst) for r in back.collect()) == sorted(PAIRS)


def test_edge_list_custom_delimiter_and_karate(spark, tmp_path):
    from tric_spark import graph
    from tric_spark.operators import tc
    from tric_spark.sources import read_binary_csr

    canon = graph.canonical_edges(
        read_binary_csr(spark, "/root/reference/karate.bin")
    )
    path = str(tmp_path / "karate_el")
    write_edge_list(canon, path, delimiter=" ")
    back = read_edge_list(spark, path, delimiter=" ")
    # full pipeline over the re-imported graph: TC must still be 45
    deg = graph.degrees(graph.symmetrize(back))
    assert tc.triangle_count_join(graph.orient_by_degree(back, deg), deg=deg) == 45


def test_graphml_export_parses_and_rounds(spark, tmp_path):
    he = spark.createDataFrame(
        [("a.com", "b.com", 3.0), ("b.com", "c.com", 1.0)],
        "src string, dst string, w double",
    )
    path = str(tmp_path / "hosts.graphml")
    n = write_graphml(he, path, directed=True, weight_col="w")
    assert n == 2
    root = ET.parse(path).getroot()
    ns = "{http://graphml.graphdrawing.org/xmlns}"
    g = root.find(f"{ns}graph")
    assert g.get("edgedefault") == "directed"
    nodes = {e.get("id") for e in g.findall(f"{ns}node")}
    assert nodes == {"a.com", "b.com", "c.com"}
    edges = [
        (e.get("source"), e.get("target"), float(e.find(f"{ns}data").text))
        for e in g.findall(f"{ns}edge")
    ]
    assert sorted(edges) == [("a.com", "b.com", 3.0), ("b.com", "c.com", 1.0)]


def test_graphml_cap_guard(spark):
    e = _edges(spark, PAIRS)
    with pytest.raises(ValueError, match="max_edges"):
        write_graphml(e, "/tmp/should_not_exist.graphml", max_edges=3)
    assert not os.path.exists("/tmp/should_not_exist.graphml")
