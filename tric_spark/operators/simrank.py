"""SimRank structural similarity (Jeh & Widom, KDD'02).
[link-graph family: "two pages are similar if they are linked to by
similar pages" — the citation-graph analog of co-citation, iterated]

    s(a,a) = 1
    s(a,b) = C / (|I(a)||I(b)|) · Σ_{i∈I(a)} Σ_{j∈I(b)} s(i,j)

with I(v) the in-neighborhood and decay C (0.8 in the paper).

Not in the reference (tric has no pairwise-similarity kernels); this is
engine breadth for the web tier — SimRank is the standard related-page
score that HITS/co-citation approximate at one step.

Scale shape — all-pairs SimRank is Θ(n²) state BY DEFINITION, so the
distributed form is only sane on a ROLLED-UP or bounded graph: the
intended 100 TB usage is hosts (10^8 hosts → only pairs reachable within
`iters` co-in-link steps materialize, because the state stays sparse:
a pair enters only via a shared positive-sim in-neighbor pair) or an
explicit candidate set. Each superstep is two edge⋈state equi-joins plus
one groupBy — state never self-joins, so lineage grows additively and a
plain per-step localCheckpoint suffices (CLAUDE.md lineage rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def simrank(
    directed: DataFrame,
    vertices: DataFrame,
    iters: int = 2,
    c: float = 0.8,
) -> DataFrame:
    """(a, b, sim) for canonical pairs a < b with positive SimRank after
    ``iters`` synchronous iterations from s0 = identity. ``directed`` is
    (src, dst) — parallel edges are deduped (SimRank is set-of-in-
    neighbors semantics); ``vertices`` is (vid,). The diagonal (always 1)
    is not emitted. The symmetric duplicate (b, a) is dropped by the
    canonical filter, never float-compared, so associativity divergence
    between the two mirror rows cannot surface."""
    edges = directed.select("src", "dst").distinct().cache()
    indeg = edges.groupBy(F.col("dst").alias("v")).agg(
        F.count(F.lit(1)).alias("ind")
    )
    diag = vertices.select(
        F.col("vid").alias("x"), F.col("vid").alias("y"), F.lit(1.0).alias("sim")
    )

    inc_a = edges.select(F.col("dst").alias("_a"), F.col("src").alias("x"))
    inc_b = edges.select(F.col("dst").alias("_b"), F.col("src").alias("y"))
    ind_a = indeg.select(F.col("v").alias("_a"), F.col("ind").alias("_ia"))
    ind_b = indeg.select(F.col("v").alias("_b"), F.col("ind").alias("_ib"))

    state = diag
    for _ in range(iters):
        summed = (
            inc_a.join(state, "x")
            .join(inc_b, "y")
            .filter(F.col("_a") != F.col("_b"))
            .groupBy("_a", "_b")
            .agg(F.sum("sim").alias("_t"))
        )
        off_diag = (
            summed.join(ind_a, "_a")
            .join(ind_b, "_b")
            .select(
                F.col("_a").alias("x"),
                F.col("_b").alias("y"),
                (F.lit(c) * F.col("_t") / (F.col("_ia") * F.col("_ib"))).alias(
                    "sim"
                ),
            )
        )
        state = off_diag.unionByName(diag).localCheckpoint(eager=True)

    return state.filter(F.col("x") < F.col("y")).select(
        F.col("x").alias("a"), F.col("y").alias("b"), "sim"
    )
