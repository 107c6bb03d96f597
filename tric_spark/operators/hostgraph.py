"""Host-graph rollup: collapse a page-level link graph to a weighted
host/domain graph — the standard web-graph aggregation (every public web
corpus ships both a page graph and a host graph; e.g. Common Crawl's
host-level webgraph releases).

Not in the reference (tric consumes a single flat edge list —
graph.hpp:346–449 reads pre-built CSR); this is engine breadth for the
web-scale tier: at 10^12 pages the host graph (~10^8 hosts) is the only
view a single machine can even hold, and host-level PageRank over it is
the classic spam/authority signal.

Scale shape: ONE groupBy over the edge table (map-side partial count —
the shuffle carries one row per distinct host pair per input partition,
not one per link). The vertex→host mapping join is a plain equi-join that
AQE broadcast-converts when the mapping is small (20 hosts at test scale);
at 10^8 hosts it is a shuffle join co-partitioned with the edge table's
own src hash — no driver-side anything.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# host = authority component of the url; mirrored verbatim by the DuckDB
# oracle (regexp_extract has identical group semantics in both engines)
HOST_RE = r"^https?://([^/]+)"


def host_of(url_col: Column | str) -> Column:
    """Host component of an http(s) url — JVM regexp, whole-stage codegen."""
    c = F.col(url_col) if isinstance(url_col, str) else url_col
    return F.regexp_extract(c, HOST_RE, 1)


def collapse_edges(
    edges: DataFrame,
    groups: DataFrame,
    drop_intra: bool = True,
) -> DataFrame:
    """Collapse a directed (src, dst) edge table by a (vid, grp) mapping:
    one output row per ordered group pair with ``n_links`` = number of
    collapsed edges. ``drop_intra`` removes within-group edges (self-loops
    of the collapsed graph — links between pages of the same host carry no
    cross-host signal and dominate raw counts on real crawls).

    Returns (src_grp, dst_grp, n_links).
    """
    g_src = groups.withColumnsRenamed({"vid": "src", "grp": "src_grp"})
    g_dst = groups.withColumnsRenamed({"vid": "dst", "grp": "dst_grp"})
    e = edges.select("src", "dst").join(g_src, "src").join(g_dst, "dst")
    if drop_intra:
        e = e.filter(F.col("src_grp") != F.col("dst_grp"))
    return e.groupBy("src_grp", "dst_grp").agg(F.count("*").alias("n_links"))


def host_edges(
    url_edges: DataFrame,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
    drop_intra: bool = True,
) -> DataFrame:
    """Weighted host graph straight from a (src_url, dst_url) link table:
    host extracted in-plan (no separate mapping join — the hosts ARE
    functions of the url columns). Returns (src_host, dst_host, n_links)."""
    e = url_edges.select(
        host_of(src_col).alias("src_host"), host_of(dst_col).alias("dst_host")
    )
    if drop_intra:
        e = e.filter(F.col("src_host") != F.col("dst_host"))
    return e.groupBy("src_host", "dst_host").agg(F.count("*").alias("n_links"))


def host_pagerank(
    host_edges_df: DataFrame,
    hosts: DataFrame,
    d: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
) -> DataFrame:
    """Host-level PageRank: weighted PageRank over the collapsed graph,
    link counts as weights — a host distributes rank to the hosts it links
    to proportionally to how many page-level links point there. ``hosts``
    is the full host vertex set (hosts with no out-links still hold rank;
    the weighted kernel folds their dangling mass in-plan). Returns
    (vid, rank) where vid is the host key."""
    from tric_spark.operators.pagerank import weighted_pagerank

    dw = host_edges_df.select(
        F.col("src_host").alias("src"),
        F.col("dst_host").alias("dst"),
        F.col("n_links").cast("double").alias("weight"),
    )
    return weighted_pagerank(dw, hosts, d=d, tol=tol, max_iter=max_iter)


def intra_host_share(
    directed_edges: DataFrame, groups: DataFrame
) -> DataFrame:
    """One row (n_intra, n_inter, intra_share) — the share of page links
    that stay inside their host (``groups``: (vid, grp)).  The
    navigational-vs-content split every host-rollup starts by reporting:
    real web crawls run ~75-90% intra-host (Broder et al. 2000 §4), and
    the number calibrates how much the host graph compresses the page
    graph.  Two joins against the (broadcastable) host map + one scalar
    aggregate; 6dp."""
    gs = groups.select(F.col("vid").alias("src"), F.col("grp").alias("gs"))
    gd = groups.select(F.col("vid").alias("dst"), F.col("grp").alias("gd"))
    j = directed_edges.join(gs, "src").join(gd, "dst")
    return j.agg(
        F.sum(F.when(F.col("gs") == F.col("gd"), 1).otherwise(0)).alias(
            "n_intra"
        ),
        F.sum(F.when(F.col("gs") != F.col("gd"), 1).otherwise(0)).alias(
            "n_inter"
        ),
        F.round(
            F.sum(F.when(F.col("gs") == F.col("gd"), 1).otherwise(0))
            / F.count(F.lit(1)),
            6,
        ).alias("intra_share"),
    )
