"""Approximate betweenness centrality via pivot-sampled Brandes.
[north-rule family: path-based importance for link graphs]

Brandes (J. Math. Sociol. 2001): exact betweenness = one BFS + one
dependency back-propagation per source. Brandes & Pich (ISAAC 2007) /
Bader et al.: sampling k pivot sources and scaling by n/k gives an
unbiased estimator — the only tractable form at web scale, where exact
betweenness is O(nm).

Not in the reference (tric counts triangles — tric.hpp:132–177); engine
breadth for the web tier: betweenness finds bridge/broker pages that
degree and PageRank both miss.

Spark shape — ALL pivots advance together as one (s, vid)-keyed state
(never a per-pivot driver loop):

- Forward: O(diameter) supersteps; each is frontier ⋈ cached adjacency →
  explode → groupBy(s, vid).sum(sigma) (ONE shuffle, map-side combined)
  + a left-anti join against the settled set. Only the frontier moves.
- Backward: O(diameter) supersteps from the deepest level; δ(v) =
  σ_v · Σ_{succ w} (1+δ_w)/σ_w — the successor aggregate is the same
  explode + groupBy shape joined back to the level's rows.
- Every superstep ends in localCheckpoint(eager) (lineage rule); the
  per-level δ frames are checkpointed, so the final accumulation union
  is a flat scan of O(diameter) materialized blocks.

State is k·n rows at worst (k pivots ~ tens to hundreds); at 10^12 pages
the shuffles are hash-partitioned on (s, vid) and AQE splits skew. σ and
δ ride as DOUBLE so path counts cannot overflow int64 on dense webs (and
the DuckDB oracle sums the same doubles bit-compatibly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tric_spark.graph import out_adjacency


def _forward(
    adj: DataFrame, pivots: DataFrame, max_depth: int
) -> list[DataFrame]:
    """BFS with shortest-path counting from every pivot at once: returns
    the per-level checkpointed frames (s, vid, dist, sigma), levels[d] =
    the vertices first reached at distance d.

    r6: the settled set is a plain union of the already-checkpointed level
    frames — the old code re-ran localCheckpoint on the growing union
    every level, re-materializing ALL settled rows O(depth) times; a union
    of LogicalRDD blocks is a flat scan of the same materialized data at
    zero extra cost. Returning the levels themselves also lets the
    backward pass read level d directly instead of filtering the full
    settled union per superstep."""
    lvl = (
        pivots.select(F.col("vid").alias("s"))
        .distinct()
        .select("s", F.col("s").alias("vid"), F.lit(0).alias("dist"),
                F.lit(1.0).alias("sigma"))
        .localCheckpoint(eager=True)
    )
    levels = [lvl]
    settled_keys = lvl.select("s", "vid")
    for depth in range(1, max_depth + 1):
        nxt = (
            lvl.join(adj, "vid")
            .select("s", F.explode("nbrs").alias("vid"), "sigma")
            .groupBy("s", "vid")
            .agg(F.sum("sigma").alias("sigma"))
            .join(settled_keys, ["s", "vid"], "left_anti")
            .withColumn("dist", F.lit(depth))
            .select("s", "vid", "dist", "sigma")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        levels.append(nxt)
        settled_keys = settled_keys.union(nxt.select("s", "vid"))
        lvl = nxt
    return levels


def betweenness_approx(
    sym_edges: DataFrame,
    vertices: DataFrame,
    pivots: DataFrame,
    max_depth: int = 32,
) -> DataFrame:
    """(vid, bc) — estimated betweenness over the UNDIRECTED graph
    (``sym_edges`` must hold both orientations, the engine's ``sym``
    convention). ``pivots``: (vid) ⊆ vertices, the sampled sources;
    pass the full vertex set for EXACT Brandes. The estimate is
    (n/k)·Σ_pivots δ_s(v)/2 — the /2 folds the double-counted unordered
    pairs of the undirected convention. ``max_depth`` truncates BFS (and
    therefore which pairs contribute) — set it ≥ the graph diameter for
    exact semantics."""
    n = vertices.count()
    k = pivots.select("vid").distinct().count()
    if k == 0:
        raise ValueError("betweenness_approx needs a non-empty pivot set")
    adj = out_adjacency(sym_edges.select("src", "dst")).select("vid", "nbrs").cache()

    levels = _forward(adj, pivots, max_depth)
    deepest = len(levels) - 1

    # backward dependency accumulation, level by level from the deepest —
    # each level read directly from its checkpointed forward frame (r6:
    # no filter over the full settled union per superstep)
    delta = levels[deepest].select(
        "s", "vid", "sigma", F.lit(0.0).alias("delta")
    ).localCheckpoint(eager=True)
    acc = [delta]
    for lvl in range(deepest - 1, -1, -1):
        # msum(v) = Σ_{successors w of v} (1+δ_w)/σ_w ; δ_v = σ_v · msum
        msum = (
            delta.join(adj, "vid")
            .select(
                "s",
                F.explode("nbrs").alias("vid"),
                ((F.lit(1.0) + F.col("delta")) / F.col("sigma")).alias("m"),
            )
            .groupBy("s", "vid")
            .agg(F.sum("m").alias("msum"))
        )
        cur = levels[lvl]
        delta = (
            cur.join(msum, ["s", "vid"], "left")
            .select(
                "s",
                "vid",
                "sigma",
                (F.col("sigma") * F.coalesce("msum", F.lit(0.0))).alias("delta"),
            )
            .localCheckpoint(eager=True)
        )
        acc.append(delta)

    all_delta = acc[0]
    for frame in acc[1:]:
        all_delta = all_delta.union(frame)
    dep = (
        all_delta.filter(F.col("vid") != F.col("s"))
        .groupBy("vid")
        .agg(F.sum("delta").alias("dep"))
    )
    scale = float(n) / float(k) / 2.0
    return vertices.select("vid").join(dep, "vid", "left").select(
        "vid",
        (F.coalesce("dep", F.lit(0.0)) * F.lit(scale)).alias("bc"),
    )
