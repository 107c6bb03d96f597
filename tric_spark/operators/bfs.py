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
