"""k-core decomposition: iterative peeling. [north-rule family: standard
link-graph analytics the engine surface should cover]

``kcore_subgraph``: repeatedly remove vertices with degree < k until the
fixpoint — the maximal subgraph where every vertex has degree ≥ k.
``core_numbers``: the full decomposition (every vertex's largest k) by
peeling k = 1, 2, … — O(k_max) rounds of the same superstep loop.

Per round: one degree aggregation + one semi-join filter. Adjacency never
materializes — only the shrinking edge list — so a 100 TB edge table peels
with bounded state. localCheckpoint bounds lineage like every other
iterative kernel here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kcore_subgraph(sym_edges: DataFrame, k: int, max_iter: int = 100) -> DataFrame:
    """Symmetric edge table of the k-core (both directions), possibly empty."""
    edges = sym_edges.select("src", "dst").localCheckpoint(eager=True)
    for _ in range(max_iter):
        deg = edges.groupBy("src").agg(F.count("*").alias("d"))
        keep = deg.filter(F.col("d") >= k).select(F.col("src").alias("vid"))
        nxt = (
            edges.join(keep.withColumnRenamed("vid", "src"), "src", "left_semi")
            .join(keep.withColumnRenamed("vid", "dst"), "dst", "left_semi")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
        n_before, n_after = edges.count(), nxt.count()
        edges = nxt
        if n_after == n_before or n_after == 0:
            break
    return edges


def core_numbers(sym_edges: DataFrame, max_k: int = 64) -> DataFrame:
    """(vid, core) — every vertex's core number, by successive peeling.
    ``max_k`` bounds the loop; web graphs rarely exceed a few hundred."""
    spark = sym_edges.sparkSession
    result = None
    edges = sym_edges.select("src", "dst").localCheckpoint(eager=True)
    k = 1
    while k <= max_k:
        nxt = kcore_subgraph(edges, k)
        in_core = edges.select(F.col("src").alias("vid")).distinct()
        still = nxt.select(F.col("src").alias("vid")).distinct()
        dropped = in_core.join(still, "vid", "left_anti").withColumn(
            "core", F.lit(k - 1)
        )
        result = dropped if result is None else result.union(dropped)
        if nxt.isEmpty():
            break
        edges = nxt
        k += 1
    if result is None:
        return spark.createDataFrame([], "vid long, core int")
    return result.localCheckpoint(eager=True)
