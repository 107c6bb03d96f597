"""k-truss decomposition — the triangle-family extension of the engine.
[north-rule family: standard link-graph analytics over the TC kernels]

The reference counts triangles (tric.hpp); the k-truss is the standard
"what do you do with per-edge triangle counts" analytic: the maximal
subgraph in which every edge participates in ≥ k−2 triangles (cohesion
between k-core and clique; non-connected variant — we do not require the
truss to be one component). Built entirely from this engine's existing
wedge-join TC plan:

- ``edge_support``: one TC pass (triangles_join) exploded to the three
  edges of each triangle + one groupBy — per-edge support, zero-filled
  over the input edge set.
- ``ktruss_edges``: fixed-k peel to the fixpoint — drop edges with
  support < k−2, recompute, repeat. Each wave is one TC pass over the
  SHRINKING edge table; localCheckpoint bounds lineage like every other
  iterative kernel here.
- ``truss_numbers``: the full decomposition with the same batch peeling
  shape as kcore.core_numbers: the level k is the running max of
  (min support + 2) over the remaining graph; every edge whose support
  drops to ≤ k−2 peels with truss = k. The level only rises when the
  remaining graph IS a (min_s+2)-truss, so every surviving edge has truss
  ≥ the new level and cascade peels at a level are exact — the same
  invariant argument as vertex peeling (verified against a sequential
  one-at-a-time python oracle in tests).

At 100 TB: each wave is the engine's own shuffle-bounded TC plan over a
strictly shrinking edge set (the first wave dominates); the per-wave
assignment union is folded into a checkpointed accumulator every
``fold_every`` waves, same as core_numbers (VERDICT r4 #8). An
incremental support-maintenance variant (subtract peeled triangles
instead of recounting) trades one shuffle for state bookkeeping; the
batch recount is the standard distributed form and keeps every wave a
pure Catalyst plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tric_spark.operators.tc import triangles_join


def edge_support(canon: DataFrame) -> DataFrame:
    """(src, dst, support) — per-edge triangle participation over the
    canonical (src < dst, deduped) edge table. Each triangle (i < j < k)
    contributes to its three edges (i,j), (i,k), (j,k); edges in no
    triangle appear with support 0."""
    tri = triangles_join(canon)
    sides = tri.select(
        F.explode(
            F.array(
                F.struct(F.col("i").alias("src"), F.col("j").alias("dst")),
                F.struct(F.col("i").alias("src"), F.col("k").alias("dst")),
                F.struct(F.col("j").alias("src"), F.col("k").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    sup = sides.groupBy("src", "dst").agg(F.count("*").alias("support"))
    return (
        canon.select("src", "dst")
        .join(sup, ["src", "dst"], "left")
        .select(
            "src", "dst", F.coalesce("support", F.lit(0)).cast("long").alias("support")
        )
    )


def ktruss_edges(canon: DataFrame, k: int, max_iter: int = 100) -> DataFrame:
    """Canonical edge table of the k-truss (possibly empty): peel edges
    with support < k−2 until the fixpoint. k ≥ 2; the 2-truss is the
    input itself (every edge has ≥ 0 triangles)."""
    if k < 2:
        raise ValueError(f"k-truss needs k >= 2 (got {k})")
    edges = canon.select("src", "dst").localCheckpoint(eager=True)
    if k == 2:
        return edges
    for _ in range(max_iter):
        keep = (
            edge_support(edges)
            .filter(F.col("support") >= k - 2)
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
        n_before, n_after = edges.count(), keep.count()
        edges = keep
        if n_after == n_before or n_after == 0:
            break
    return edges


def truss_numbers(
    canon: DataFrame, max_rounds: int = 1024, fold_every: int = 32
) -> DataFrame:
    """(src, dst, truss) — every edge's truss number (largest k such that
    the edge survives in the k-truss), single-pass batch peeling. Edges in
    no triangle have truss 2.

    Same bounded-plan accumulation as kcore.core_numbers: per-wave
    assignments fold into a checkpointed running union every
    ``fold_every`` waves."""
    spark = canon.sparkSession
    edges = canon.select("src", "dst").localCheckpoint(eager=True)
    out: DataFrame | None = None
    pending: list[DataFrame] = []
    any_assigned = False

    def fold() -> None:
        nonlocal out, pending
        if not pending:
            return
        acc = pending[0]
        for part in pending[1:]:
            acc = acc.union(part)
        out = acc if out is None else out.union(acc)
        out = out.localCheckpoint(eager=True)
        pending = []

    k = 2
    for _ in range(max_rounds):
        sup = edge_support(edges).localCheckpoint(eager=True)
        min_s = sup.agg(F.min("support")).collect()[0][0]
        if min_s is None:  # no edges left — every edge assigned
            break
        k = max(k, int(min_s) + 2)
        keep = (
            sup.filter(F.col("support") > k - 2)
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
        gone = sup.filter(F.col("support") <= k - 2).select(
            "src", "dst", F.lit(k).cast("long").alias("truss")
        )
        pending.append(gone)
        any_assigned = True
        if len(pending) >= fold_every:
            fold()
        edges = keep
    else:
        import warnings

        warnings.warn(
            f"truss_numbers: max_rounds={max_rounds} reached at level {k}; "
            "emitting survivors clamped to the current level"
        )
        pending.append(
            edges.select("src", "dst").withColumn("truss", F.lit(k).cast("long"))
        )
        any_assigned = True
    if not any_assigned:
        return spark.createDataFrame([], "src long, dst long, truss long")
    fold()
    assert out is not None
    return out
