"""Multi-source BFS distances over the link graph.

Frontier-expansion supersteps: dist starts at 0 for sources; each round the
frontier's neighbors get min(dist)+1 if unvisited. O(diameter) rounds, one
shuffle per round (frontier ⋈ adjacency + groupBy-min), frontier-only join
(not the whole vertex set) so late rounds are cheap.

Unreached vertices are absent from the result (join with the vertex table
to fill -1/null if needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tric_spark.graph import out_adjacency


def bfs_distances(
    sym_edges: DataFrame, sources: DataFrame, max_depth: int = 64
) -> DataFrame:
    """(vid, dist) — hop distance from the nearest source.
    ``sources``: DataFrame with a ``vid`` column."""
    adj = out_adjacency(sym_edges.select("src", "dst")).select("vid", "nbrs").cache()
    dist = sources.select("vid").distinct().withColumn("dist", F.lit(0))
    dist = dist.localCheckpoint(eager=True)
    frontier = dist
    for depth in range(1, max_depth + 1):
        nxt = (
            adj.join(frontier.select("vid"), "vid", "left_semi")
            .select(F.explode("nbrs").alias("vid"))
            .distinct()
            .join(dist.select("vid"), "vid", "left_anti")
            .withColumn("dist", F.lit(depth))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        dist = dist.union(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return dist


def double_sweep_bound(sym_edges: DataFrame, start_vid: int = 0) -> DataFrame:
    """One row (start_vid, far_vid, diameter_lb) — the classic double-BFS
    diameter lower bound (the first move of iFUB, Crescenzi et al.): BFS
    from ``start_vid``, hop to the farthest reached vertex (ties: min
    vid), BFS again; the second eccentricity is a lower bound on the
    diameter of start's component, and on trees/many real graphs it is
    exact. The companion to the ANF/effective-diameter sketch: that one
    estimates the distribution, this one certifies a hard bound.

    The pivot pick is a 1-row scalar collect between the two BFS runs
    (documented driver action, same class as a convergence check)."""
    spark = sym_edges.sparkSession
    src = spark.createDataFrame([(start_vid,)], "vid long")
    d1 = bfs_distances(sym_edges, src)
    far = d1.orderBy(F.col("dist").desc(), F.col("vid").asc()).limit(1).collect()[0]
    src2 = spark.createDataFrame([(int(far["vid"]),)], "vid long")
    d2 = bfs_distances(sym_edges, src2)
    return (
        d2.agg(F.max("dist").alias("diameter_lb"))
        .select(
            F.lit(start_vid).alias("start_vid"),
            F.lit(int(far["vid"])).alias("far_vid"),
            "diameter_lb",
        )
    )
