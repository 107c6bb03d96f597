"""Local graph clustering: the PPR sweep cut (Andersen–Chung–Lang,
FOCS'06 "Local Graph Partitioning using PageRank Vectors").
[north-rule family: seed-local community detection for link graphs]

Given a personalized-PageRank vector from a seed, order vertices by the
degree-normalized score p(v)/deg(v) and sweep prefixes S_k = top-k,
reporting the conductance

    phi(S_k) = cut(S_k) / min(vol(S_k), vol(V) - vol(S_k))

of every prefix; the argmin prefix is the local cluster. Cheeger-style
guarantee: some prefix of the exact ordering has conductance
O(sqrt(phi_opt log n)).

Not in the reference (tric is a triangle-counting engine; its PageRank
analog is the rank kernels SURVEY §2.5 maps) — this composes the engine's
own `personalized_pagerank` into the standard seed-expansion primitive
crawl/anti-spam pipelines use ("grow a trusted set around a seed").

Spark shape — the sweep is BOUNDED by construction, which is what makes
it a 100 TB operator:

  * scoring + top-T: one join (ranks ⋈ degrees) and a distributed
    TakeOrderedAndProject (every partition keeps a local top-T; no global
    sort). T is the support budget of the approximate PPR vector — the
    ACL algorithm only ever sweeps the vector's support, here capped.
  * positions + prefix sums: windows over the T-row frame — a single
    task over a constant-size set, by design (T defaults to 64).
  * internal-edge counting: the canonical edge table joined against the
    T-row position set twice, BROADCAST both times — one scan of the
    edges, no shuffle; an edge {u,v} becomes internal at
    k = max(pos(u), pos(v)), so one groupBy(ka) yields every prefix's
    internal count at once.
  * vol(V): a 1-row aggregate cross-joined broadcast (the PageRank
    dangling-fold pattern).

Scores are rounded to 6dp BEFORE ordering (rank-on-the-rounded-key, the
repo's A-ES sampling lore) so the DuckDB oracle replays the identical
total order (score DESC, vid ASC) despite last-ulp float divergence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sweep_cut(
    sym_edges: DataFrame,
    degrees: DataFrame,
    ranks: DataFrame,
    top_t: int = 64,
) -> DataFrame:
    """(k, vid, score, conductance) for k = 1..top_t: the conductance
    sweep over the degree-normalized ``ranks`` ordering.

    ``sym_edges`` holds both orientations (engine sym convention);
    ``degrees`` is (vid, degree) over the same graph; ``ranks`` is
    (vid, rank) — any non-negative vertex scoring, canonically the
    output of ``personalized_pagerank``. A prefix covering the whole
    volume (min-side 0) reports NULL conductance rather than dividing
    by zero (Spark 4 ANSI mode throws on x/0)."""
    scored = ranks.join(degrees, "vid").select(
        "vid",
        F.round(F.col("rank") / F.col("degree"), 6).alias("score"),
        "degree",
    )
    top = scored.orderBy(F.col("score").desc(), F.col("vid").asc()).limit(top_t)
    w = Window.orderBy(F.col("score").desc(), F.col("vid").asc())
    pos = top.select(
        "vid", "score", "degree", F.row_number().over(w).alias("k")
    )

    p_src = pos.select(F.col("vid").alias("src"), F.col("k").alias("_k1"))
    p_dst = pos.select(F.col("vid").alias("dst"), F.col("k").alias("_k2"))
    internal = (
        sym_edges.filter(F.col("src") < F.col("dst"))
        .join(F.broadcast(p_src), "src")
        .join(F.broadcast(p_dst), "dst")
        .select(F.greatest("_k1", "_k2").alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("_c"))
    )

    cw = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sweep = (
        pos.join(internal, "k", "left")
        .select(
            "k",
            "vid",
            "score",
            F.sum("degree").over(cw).alias("_volk"),
            F.sum(F.coalesce("_c", F.lit(0))).over(cw).alias("_intk"),
        )
    )

    tot = degrees.agg(F.sum("degree").alias("_vol"))
    min_side = F.least(F.col("_volk"), F.col("_vol") - F.col("_volk"))
    return sweep.crossJoin(F.broadcast(tot)).select(
        "k",
        "vid",
        "score",
        F.when(
            min_side > 0,
            F.round((F.col("_volk") - 2 * F.col("_intk")) / min_side, 6),
        ).alias("conductance"),
    )


def best_cut(sweep: DataFrame) -> DataFrame:
    """The argmin-conductance prefix of a ``sweep_cut`` curve, as one row
    (k, conductance) — ties broken toward the SMALLER prefix. A bounded
    orderBy(...).limit(1) over the T-row curve."""
    return (
        sweep.filter(F.col("conductance").isNotNull())
        .orderBy(F.col("conductance").asc(), F.col("k").asc())
        .limit(1)
        .select("k", "conductance")
    )
