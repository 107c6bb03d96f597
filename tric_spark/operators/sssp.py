"""Weighted single-source shortest paths — Bellman–Ford supersteps.
[north-rule family: weighted path analytics; bfs.py covers only hop
counts]

The distributed SSSP everyone actually runs (Pregel's flagship example,
Malewicz et al. SIGMOD'10): per superstep every improved vertex relaxes
its out-edges, dist'(v) = min(dist(v), min over u→v of dist(u) + w).
Terminates in ≤ |longest shortest path in hops| rounds on non-negative
weights; one map-side-combined shuffle per round.

Spark shape: the FRONTIER (vertices improved last round) joins the
weighted adjacency — not the full distance table — so late rounds touch
only the shrinking active set (the bfs.py discipline, with weights).
Improvement test is one join against the current distance state; both
frames are eagerly checkpointed per round (lineage rule). An
every-round scalar emptiness test doubles as termination detection.

At 10^12 scale: state is (vid, dist) doubles, shuffles keyed on vid
co-locate round over round, and the frontier is the only moving set —
the standard delta-stepping refinement would bucket the frontier by
distance, same join shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shortest_paths(
    edges_w: DataFrame,
    sources: DataFrame,
    max_rounds: int = 64,
) -> DataFrame:
    """(vid, dist) — weighted distance from the nearest source.
    ``edges_w``: directed (src, dst, weight) with NON-NEGATIVE weights
    (Bellman–Ford relaxation; negative cycles would never terminate —
    caller's contract, as everywhere). ``sources``: (vid) rows at
    distance 0. Unreached vertices are absent (join the vertex table for
    null-fill). ``max_rounds`` bounds the replayable unroll; rounds after
    convergence are empty no-ops."""
    e = edges_w.select("src", "dst", F.col("weight").cast("double").alias("w"))
    dist = (
        sources.select("vid")
        .distinct()
        .withColumn("dist", F.lit(0.0))
        .localCheckpoint(eager=True)
    )
    frontier = dist
    for _ in range(max_rounds):
        cand = (
            frontier.join(e, frontier["vid"] == e["src"])
            .select(F.col("dst").alias("vid"), (F.col("dist") + F.col("w")).alias("nd"))
            .groupBy("vid")
            .agg(F.min("nd").alias("nd"))
        )
        improved = (
            cand.join(dist, "vid", "left")
            .filter(F.col("dist").isNull() | (F.col("nd") < F.col("dist")))
            .select("vid", F.col("nd").alias("dist"))
            .localCheckpoint(eager=True)
        )
        if improved.isEmpty():
            break
        dist = (
            dist.join(improved.select("vid"), "vid", "left_anti")
            .union(improved)
            .localCheckpoint(eager=True)
        )
        frontier = improved
    return dist
