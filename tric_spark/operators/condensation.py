"""Condensation DAG + longest-path topological layering.
[link-graph family: the quotient graph over SCCs — the web's "flow
structure" (Broder et al., WWW 2000) made explicit, and the layering is
the standard crawl-scheduling / dependency-depth readout]

``condensation_edges`` collapses a directed page graph by its SCC labels
(one groupBy — the host-rollup shape, reused from hostgraph); the result
is acyclic by construction. ``dag_layers`` assigns every component its
longest-path depth from the source layer:

    layer(v) = 0                       if v has no in-edges
    layer(v) = 1 + max_{u→v} layer(u)  otherwise

via the monotone fixpoint l'(v) = greatest(l(v), 1 + max_{u→v} l(u)) from
l0 = 0 — convergence in exactly `depth` supersteps, detected by the layer
sum going stationary (one scalar action per round, the PageRank delta
pattern).

Scale shape: each superstep is one edges⋈state join + groupBy(dst) max +
one left join back — the state is |components| rows (orders of magnitude
below |pages| on web graphs: the giant CORE is one row). The step
references its state twice (inner max + outer greatest), so it uses
``checkpoint_cut`` per round (CLAUDE.md: OUTER self-joins square the
origin sizeInBytes; the cut resets stats, not just lineage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tric_spark.plans.lineage import checkpoint_cut


def condensation_edges(directed: DataFrame, labels: DataFrame) -> DataFrame:
    """(src, dst, n_links) between DISTINCT SCC labels — the condensation
    multigraph with parallel page-links counted, self-loops (intra-SCC
    edges) dropped. ``labels`` is (vid, label) — a TOTAL SCC labeling."""
    from tric_spark.operators.hostgraph import collapse_edges

    grp = labels.select("vid", F.col("label").alias("grp"))
    ce = collapse_edges(directed.select("src", "dst"), grp, drop_intra=True)
    return ce.select(
        F.col("src_grp").alias("src"), F.col("dst_grp").alias("dst"), "n_links"
    )


def dag_layers(
    dag_edges: DataFrame, components: DataFrame, max_rounds: int = 64
) -> DataFrame:
    """(comp, layer) — longest-path depth of every component of an
    acyclic ``dag_edges`` (src, dst) graph; ``components`` is (comp,) the
    total vertex set. Raises if the fixpoint is still moving after
    ``max_rounds`` (a cycle — the input was not a condensation)."""
    edges = dag_edges.select("src", "dst").cache()
    state = checkpoint_cut(
        components.select("comp", F.lit(0).cast("long").alias("layer"))
    )
    prev_sum = 0
    for _ in range(max_rounds):
        m = (
            edges.join(state.withColumnRenamed("comp", "src"), "src")
            .groupBy(F.col("dst").alias("comp"))
            .agg((F.max("layer") + 1).alias("_in"))
        )
        nxt = state.join(m, "comp", "left").select(
            "comp",
            F.greatest("layer", F.coalesce("_in", F.lit(0))).alias("layer"),
        )
        state = checkpoint_cut(nxt)
        cur_sum = state.agg(F.sum("layer")).collect()[0][0]
        if cur_sum == prev_sum:
            return state
        prev_sum = cur_sum
    raise ValueError(
        f"dag_layers did not converge in {max_rounds} rounds — "
        "the input graph has a cycle (not a condensation?)"
    )
