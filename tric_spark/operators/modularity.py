"""Newman modularity of a vertex partition over the undirected graph.
[north-rule family: community-structure quality for link graphs]

Newman & Girvan (Phys. Rev. E 69, 2004): Q = Σ_c (m_c/m − (D_c/2m)²) —
the fraction of edges inside communities minus the fraction expected
under the degree-preserving null model. THE acceptance metric for any
community labeling (here: label_propagation's output), and the quantity
Louvain-style algorithms climb.

Spark shape — everything stays in-plan, no driver collects:

    t1 = (Σ_c m_c)/m    — ONE count over intra-community canonical edges
                          (label equality checked edge-wise: two broadcast-
                          friendly vid joins, never a per-community fan-out)
    t2 = Σ_c D_c²/(2m)² — degrees summed per label (one groupBy), squared,
                          summed (a second tiny groupBy over |C| rows)
    Q  = t1 − t2        — three 1-row aggregates cross-joined broadcast,
                          exactly the PageRank dangling-fold pattern

At 10^12 scale: the label join is the only big shuffle (edges ⋈ labels on
vid, twice — AQE handles the skewed giant-community case); the per-label
frames are |communities| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def modularity(
    sym_edges: DataFrame, labels: DataFrame, label_col: str = "label"
) -> DataFrame:
    """One row (modularity, n_communities, m_edges). ``sym_edges`` holds
    both orientations (the engine's sym convention — m = |rows|/2);
    ``labels`` is (vid, label). Vertices missing from ``labels`` would
    null their edges' terms — callers pass a TOTAL labeling (LP/CC output
    covers every vertex of sym). An edgeless graph reports Q = 0.0."""
    la = labels.select(F.col("vid").alias("src"), F.col(label_col).alias("_la"))
    lb = labels.select(F.col("vid").alias("dst"), F.col(label_col).alias("_lb"))
    e = sym_edges.select("src", "dst").join(la, "src").join(lb, "dst")
    mm = sym_edges.agg((F.count(F.lit(1)) / 2).cast("long").alias("_m"))
    intra = e.filter(
        (F.col("_la") == F.col("_lb")) & (F.col("src") < F.col("dst"))
    ).agg(F.count(F.lit(1)).alias("_mc"))
    dsq = (
        e.groupBy("src", "_la")
        .agg(F.count(F.lit(1)).alias("_d"))
        .groupBy("_la")
        .agg(F.sum("_d").alias("_dc"))
        .agg(
            F.sum(F.col("_dc") * F.col("_dc")).alias("_dsq"),
            F.count(F.lit(1)).alias("_nc"),
        )
    )
    return (
        mm.crossJoin(F.broadcast(intra))
        .crossJoin(F.broadcast(dsq))
        .select(
            F.round(
                F.when(F.col("_m") > 0,
                       F.col("_mc") / F.col("_m")
                       - F.coalesce("_dsq", F.lit(0))
                       / (F.lit(4.0) * F.col("_m") * F.col("_m"))
                       ).otherwise(F.lit(0.0)),
                6,
            ).alias("modularity"),
            F.coalesce("_nc", F.lit(0)).alias("n_communities"),
            F.col("_m").alias("m_edges"),
        )
    )
