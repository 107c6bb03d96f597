"""Connected components via hash-min label propagation. [north-rule]

Semantics (SURVEY §2.5): comp(v) starts at v; each superstep
comp(v) ← min(comp(v), min over neighbors' comp); fixpoint when no row
changes. Component id = min vertex id in the component (exact-match oracle).

Scale notes: each superstep is one shuffle (edges ⋈ comps on src, groupBy
dst min). Hash-min converges in O(diameter) supersteps — fine for web graphs
(small diameter); for adversarially long paths the two-phase large-star/
small-star variant (Kiveris et al., "Connected Components in MapReduce")
drops it to O(log n); ``cc_star`` implements it for that regime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tric_spark.streaming.supersteps import SuperstepDriver


def connected_components(
    sym_edges: DataFrame,
    vertices: DataFrame,
    max_iter: int = 200,
    driver: SuperstepDriver | None = None,
) -> DataFrame:
    """(vid, comp) at fixpoint. ``sym_edges`` must hold both directions."""
    comps = vertices.withColumn("comp", F.col("vid"))
    edges = sym_edges.select("src", "dst")

    def step(comps: DataFrame) -> DataFrame:
        nbr_min = (
            edges.join(comps.withColumnRenamed("vid", "src"), "src")
            .groupBy(F.col("dst").alias("vid"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        return (
            comps.join(nbr_min, "vid", "left")
            .select(
                "vid",
                F.least(
                    F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))
                ).alias("comp"),
            )
        )

    def converged(old: DataFrame, new: DataFrame, _i: int) -> bool:
        changed = (
            old.withColumnRenamed("comp", "old_comp")
            .join(new, "vid")
            .filter(F.col("comp") != F.col("old_comp"))
            .count()
        )
        return changed == 0

    if driver is not None:
        return driver.run(
            init=comps,
            step=step,
            converged=converged,
            max_iter=max_iter,
            state_schema="vid long, comp long",
        )

    cur = comps.localCheckpoint(eager=True)
    for i in range(max_iter):
        nxt = step(cur).localCheckpoint(eager=True)
        if converged(cur, nxt, i):
            return nxt
        cur = nxt
    return cur
