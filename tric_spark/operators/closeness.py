"""Approximate closeness / harmonic centrality via pivot-sampled BFS.
[north-rule family: path-based importance for link graphs]

Eppstein & Wang (SODA 2001): sampling k pivot sources and averaging their
distances estimates every vertex's centrality with O(k·(n+m)) work — the
only tractable form at web scale. The headline score here is HARMONIC
centrality, h(v) = Σ_{u≠v} 1/d(u,v), estimated as (n/k)·Σ_pivots 1/d(s,v):
Boldi & Vigna ("Axioms for Centrality", Internet Math. 10(3-4), 2014)
show it is the variant that stays well-defined on disconnected and
truncated graphs (unreachable pairs contribute 0, no ∞ farness) — exactly
the regime of a web crawl. The raw per-vertex (n_sources, sum_dist)
aggregates ship alongside so a caller can form any closeness variant.

Spark shape: the forward multi-pivot BFS is SHARED with betweenness
(betweenness._forward — all pivots advance as one (s, vid)-keyed state,
one map-side-combined shuffle per level, localCheckpoint per superstep),
then ONE groupBy(vid) over the settled (s, vid, dist) rows. At 10^12
pages: state ≤ k·n rows, hash-partitioned on (s, vid); the final
aggregate is a single co-located shuffle.

``max_depth`` truncates the BFS on BOTH engines identically (the
truncation-consistent convention from the betweenness oracle): pairs
farther than max_depth contribute nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tric_spark.graph import out_adjacency
from tric_spark.operators.betweenness import _forward


def harmonic_closeness_approx(
    sym_edges: DataFrame,
    vertices: DataFrame,
    pivots: DataFrame,
    max_depth: int = 32,
) -> DataFrame:
    """(vid, n_sources, sum_dist, harmonic) over the UNDIRECTED graph
    (``sym_edges`` holds both orientations). ``pivots`` ⊆ vertices; pass
    the full vertex set for the EXACT harmonic centrality. ``n_sources``
    counts pivots reaching v (v itself excluded), ``sum_dist`` their total
    hop distance, ``harmonic`` the (n/k)-scaled 6dp-rounded estimate of
    Σ 1/d. Vertices no pivot reaches report (0, 0, 0.0)."""
    n = vertices.count()
    k = pivots.select("vid").distinct().count()
    if k == 0:
        raise ValueError("harmonic_closeness_approx needs a non-empty pivot set")
    adj = out_adjacency(sym_edges.select("src", "dst")).select("vid", "nbrs").cache()
    levels = _forward(adj, pivots, max_depth)
    settled = levels[0]
    for lv in levels[1:]:
        settled = settled.union(lv)
    scale = float(n) / float(k)
    agg = (
        settled.filter(F.col("dist") > 0)
        .groupBy("vid")
        .agg(
            F.count(F.lit(1)).alias("n_sources"),
            F.sum("dist").alias("sum_dist"),
            F.round(
                F.sum(F.lit(1.0) / F.col("dist")) * F.lit(scale), 6
            ).alias("harmonic"),
        )
    )
    return vertices.select("vid").join(agg, "vid", "left").select(
        "vid",
        F.coalesce("n_sources", F.lit(0)).alias("n_sources"),
        F.coalesce("sum_dist", F.lit(0).cast("long")).alias("sum_dist"),
        F.coalesce("harmonic", F.lit(0.0)).alias("harmonic"),
    )
