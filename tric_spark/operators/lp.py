"""Synchronous label propagation. [north-rule]

Semantics (SURVEY §2.5): every vertex starts with label = vid; each
superstep ALL vertices simultaneously adopt the most frequent label among
their neighbors, ties broken by the smallest label; run a fixed number of
supersteps (synchronous LP need not converge — it can 2-cycle on bipartite
graphs, which the K3,3 fixture exercises). Deterministic by construction:
the tie-break is a total order, so the result is independent of
partitioning/scheduling.

Per superstep: one shuffle (edges ⋈ labels on src, groupBy (dst,label)
count) + one window top-1. The window partitions by vertex — no global
sort, scales as a hash shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tric_spark.streaming.supersteps import SuperstepDriver


def label_propagation(
    sym_edges: DataFrame,
    vertices: DataFrame,
    num_iter: int = 5,
    driver: SuperstepDriver | None = None,
) -> DataFrame:
    """(vid, label) after ``num_iter`` synchronous supersteps."""
    from tric_spark.graph import out_adjacency

    labels = vertices.withColumn("label", F.col("vid"))
    # adjacency-list form cached once (see pagerank.py for the shuffle math)
    adj = out_adjacency(sym_edges.select("src", "dst")).cache()

    def step(labels: DataFrame) -> DataFrame:
        freq = (
            adj.join(labels, "vid")
            .select(F.explode("nbrs").alias("vid"), "label")
            .groupBy("vid", "label")
            .agg(F.count("*").alias("n"))
        )
        w = Window.partitionBy("vid").orderBy(F.col("n").desc(), F.col("label").asc())
        best = (
            freq.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vid", "label")
        )
        # isolated vertices keep their label
        return (
            labels.withColumnRenamed("label", "old_label")
            .join(best, "vid", "left")
            .select("vid", F.coalesce(F.col("label"), F.col("old_label")).alias("label"))
        )

    if driver is not None:
        return driver.run(
            init=labels,
            step=step,
            converged=lambda *_: False,
            max_iter=num_iter,
            state_schema="vid long, label long",
        )

    # checkpoint per superstep, deliberately NOT chained: the LP step
    # references its input twice (contribution join + isolated-vertex
    # fallback join), so chained lazy steps recompute the window-heavy
    # inner plan — measured ~15% slower than per-step materialization at
    # sf0.1 (A/B in git history; PageRank chains because its step is a
    # single cheap join pipeline)
    cur = labels.localCheckpoint(eager=True)
    for _ in range(num_iter):
        cur = step(cur).localCheckpoint(eager=True)
    return cur
