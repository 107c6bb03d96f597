"""Per-component bipartiteness / odd-cycle detection.

A component is bipartite iff a BFS 2-coloring (hop-distance parity from
the component's representative) has no monochromatic edge — any such
"conflict" edge closes an odd cycle.  Link-graph use: bipartite regions
are navigational template structure (index↔leaf alternation), odd cycles
mark content cross-linking; it's also the precondition check for the
bipartite-only algorithms (matching.py).

Composed entirely from existing kernels: hash-min connected components
(cc.py) picks the min-vid representative per component, the multi-source
frontier BFS (bfs.py) colors every component simultaneously in one run
(supersteps = graph diameter, not per component), and the conflict count
is a single edges⋈parity join.  No new iterative machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tric_spark.operators.bfs import bfs_distances
from tric_spark.operators.cc import connected_components


def bipartite_components(
    canon_edges: DataFrame,
    sym_edges: DataFrame,
    vertices: DataFrame,
    max_depth: int = 32,
) -> DataFrame:
    """(component, n_vertices, n_conflicts, is_bipartite) per connected
    component.  ``max_depth`` must exceed the graph diameter (the BFS
    coloring is exact below it — same contract as bfs_distances)."""
    comp = connected_components(sym_edges, vertices)
    reps = comp.filter(F.col("vid") == F.col("comp")).select("vid")
    par = bfs_distances(sym_edges, reps, max_depth=max_depth).select(
        "vid", (F.col("dist") % 2).alias("par")
    )
    conf = (
        canon_edges.join(
            par.select(F.col("vid").alias("src"), F.col("par").alias("psrc")),
            "src",
        )
        .join(
            par.select(F.col("vid").alias("dst"), F.col("par").alias("pdst")),
            "dst",
        )
        .filter(F.col("psrc") == F.col("pdst"))
        .join(comp.withColumnRenamed("vid", "src"), "src")
        .groupBy("comp")
        .agg(F.count(F.lit(1)).alias("n_conflicts"))
    )
    return (
        comp.groupBy("comp")
        .agg(F.count(F.lit(1)).alias("n_vertices"))
        .join(conf, "comp", "left")
        .select(
            F.col("comp").alias("component"),
            "n_vertices",
            F.coalesce("n_conflicts", F.lit(0)).alias("n_conflicts"),
            (F.coalesce("n_conflicts", F.lit(0)) == 0).alias("is_bipartite"),
        )
    )
