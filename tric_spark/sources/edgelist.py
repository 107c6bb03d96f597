"""Plain-text edge-list source/sink (SNAP/WebGraph-ASCII interchange) and
a bounded GraphML export.

The reference ingests only its private binary CSR (graph.hpp:346–449) and
prints adjacency dumps (graph.hpp:226–268); real link-graph exchange uses
delimiter-separated ``src<TAB>dst`` text with ``#`` comment headers (the
SNAP datasets, Common Crawl's webgraph releases, WebGraph's ASCII form).
This module makes that a first-class distributed format:

- ``write_edge_list`` / ``read_edge_list`` — fully distributed: one text
  part-file per partition on write; on read Spark's CSV scanner splits
  files by byte range, the ``#`` comment filter and the two-column cast
  stay inside whole-stage codegen, and schema is declared (never
  inferred — inference would double-scan 100 TB).
- ``write_graphml`` — single-document XML for tool interchange
  (Gephi/NetworkX/igraph). XML cannot be concatenated per-partition, so
  this is driver-side BY DESIGN and refuses graphs above ``max_edges``
  loudly: it is the debug/handoff sink for collapsed views (host graphs,
  community summaries), never the page-level sink. The distributed path
  for big graphs is the edge list or parquet.
"""

from __future__ import annotations

import xml.sax.saxutils as _sax

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def write_edge_list(
    edges: DataFrame,
    path: str,
    delimiter: str = "\t",
    comments: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write (src, dst) as delimiter-separated text, one part-file per
    partition (the distributed shape — a 100 TB graph leaves as many
    files). ``comments``: optional ``# ``-prefixed header lines written as
    a separate ``_header`` part so readers that concatenate
    lexicographically see them first; plain readers skip them as comments.
    """
    out = edges.select(
        F.col("src").cast("string"), F.col("dst").cast("string")
    )
    writer = out.write.mode(mode).option("sep", delimiter)
    writer.csv(path)
    if comments:
        spark = edges.sparkSession
        hdr = spark.createDataFrame(
            [(f"# {c}",) for c in comments], "line string"
        ).coalesce(1)
        hdr.write.mode("append").text(path)


def read_edge_list(
    spark: SparkSession,
    path: str,
    delimiter: str = "\t",
) -> DataFrame:
    """(src, dst) from delimiter-separated text; ``#`` comment lines and
    blanks are dropped in-plan (a codegen'd filter ahead of the cast, so
    the scan stays a single pass). Declared schema — no inference scan."""
    schema = T.StructType(
        [
            T.StructField("src", T.StringType()),
            T.StructField("dst", T.StringType()),
        ]
    )
    raw = (
        spark.read.option("sep", delimiter)
        .option("comment", "#")
        .schema(schema)
        .csv(path)
    )
    return raw.filter(
        F.col("src").isNotNull() & F.col("dst").isNotNull()
    ).select(F.col("src").cast("long"), F.col("dst").cast("long"))


def write_graphml(
    edges: DataFrame,
    path: str,
    directed: bool = False,
    max_edges: int = 1_000_000,
    weight_col: str | None = None,
) -> int:
    """Export (src, dst[, weight]) as a single GraphML document; returns
    the edge count written. Driver-side by design (GraphML is one XML
    tree) and guarded: raises ValueError above ``max_edges`` instead of
    silently materializing a web graph on the driver — use
    ``write_edge_list`` or parquet there. Node elements are emitted for
    every endpoint; ids are XML-escaped so string host keys survive."""
    cols = [F.col("src").cast("string"), F.col("dst").cast("string")]
    if weight_col is not None:
        cols.append(F.col(weight_col).cast("double").alias("_w"))
    rows = edges.select(*cols).limit(max_edges + 1).collect()
    if len(rows) > max_edges:
        raise ValueError(
            f"write_graphml: graph exceeds max_edges={max_edges}; "
            "GraphML is a single-document driver-side sink — export big "
            "graphs with write_edge_list/parquet instead"
        )
    esc = _sax.escape
    nodes: dict[str, None] = {}
    for r in rows:
        nodes.setdefault(r[0], None)
        nodes.setdefault(r[1], None)
    lines = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<graphml xmlns="http://graphml.graphdrawing.org/xmlns">',
    ]
    if weight_col is not None:
        lines.append(
            '  <key id="w" for="edge" attr.name="weight" attr.type="double"/>'
        )
    lines.append(
        f'  <graph edgedefault="{"directed" if directed else "undirected"}">'
    )
    for n in nodes:
        lines.append(f'    <node id="{esc(n, {chr(34): "&quot;"})}"/>')
    for r in rows:
        s = esc(r[0], {'"': "&quot;"})
        t = esc(r[1], {'"': "&quot;"})
        if weight_col is not None:
            lines.append(
                f'    <edge source="{s}" target="{t}">'
                f'<data key="w">{r[2]}</data></edge>'
            )
        else:
            lines.append(f'    <edge source="{s}" target="{t}"/>')
    lines += ["  </graph>", "</graphml>", ""]
    with open(path, "w", encoding="utf-8") as fh:
        fh.write("\n".join(lines))
    return len(rows)
