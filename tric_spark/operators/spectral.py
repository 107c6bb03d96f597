"""Spectral bipartition: the Fiedler direction of the normalized
adjacency by deflated power iteration.

For the symmetric normalized adjacency N = D^{-1/2} A D^{-1/2} the TOP
eigenvector is known in closed form — v1 ∝ D^{1/2}·1 (eigenvalue 1 on
each connected component) — so the second eigenvector (the Fiedler
direction, whose sign pattern is the classic 2-way spectral cut) comes
from power iteration of the LAZY operator with an EXACT deflation each
step:

    x ← (x + N x)/2 − (v1ᵀ x)·v1,   x ← x/‖x‖₂

The lazy shift (I + N)/2 maps the spectrum to [0, 1], which is
load-bearing: on (near-)bipartite graphs N's MOST NEGATIVE eigenvalue
approaches −1 and would dominate |λ|-wise, so un-shifted power iteration
converges to the bipartite parity vector instead of the Fiedler
direction (caught by the path-graph test — a path is bipartite).

No Lanczos, no re-orthogonalization drift: the deflation vector is a
static column computed once from the degrees.

Spark shape per superstep — exactly the PageRank profile: the n-row state
joins the cached weighted adjacency (1/sqrt(d_u d_v) folded into the
struct at build time, so no per-step degree join), one map-side-combined
groupBy-sum, then TWO broadcast 1-row aggregates (the v1 projection and
the L2 norm — the dangling-fold pattern, zero driver collects) and a
localCheckpoint.  Init is a deterministic md5 uniform in [-0.5, 0.5) per
vertex, so the trajectory is replayable at any parallelism and by the SQL
oracle (fixed-iteration mode); the emitted side is pinned by 6dp-rounding
the component before the sign (the hyperplane-LSH convention) and by
flipping the whole vector so the minimum vid lands on side 0.

Reference parity: none (tric is TC-only); spectral partitioning joins
louvain/lp/mis in the community/partitioning family — and its output
feeds plans/partition.edge_cut_report for a measured layout decision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tric_spark.plans.lineage import checkpoint_cut


def _u01(vid, seed: int):
    h = F.md5(
        F.concat_ws(":", F.lit("spec"), F.lit(str(seed)), vid.cast("string"))
    )
    return F.conv(F.substring(h, 1, 12), 16, 10).cast("double") / F.lit(
        float(16**12)
    )


def fiedler_vector(
    sym_edges: DataFrame, iters: int = 8, seed: int = 42
) -> DataFrame:
    """(vid, x) — the deflated-power-iteration estimate of the Fiedler
    direction after ``iters`` fixed supersteps (oracle-replayable mode).
    Operates on the symmetric edge table (src, dst); vertices are those
    with at least one edge (isolated pages have no cut side)."""
    deg = sym_edges.groupBy(F.col("src").alias("vid")).agg(
        F.count(F.lit(1)).alias("d")
    )
    # weighted adjacency with 1/sqrt(d_u d_v) folded in at build time
    dl = deg.select(F.col("vid").alias("src"), F.col("d").alias("ds"))
    dr = deg.select(F.col("vid").alias("dst"), F.col("d").alias("dt"))
    # r6 (guide §2.4 — establish the partitioning once): the degree joins
    # are broadcasts, so the cached frame inherited the raw edge scan's
    # arbitrary partitioning and EVERY superstep re-exchanged + re-sorted
    # all m rows for its SortMergeJoin against the n-row state. Hash-
    # partition and sort by vid at build; the cache preserves both, so
    # per superstep only the n-row state moves.
    wadj = (
        sym_edges.join(dl, "src")
        .join(dr, "dst")
        .select(
            F.col("src").alias("vid"),
            F.col("dst").alias("nbr"),
            (F.lit(1.0) / F.sqrt(F.col("ds") * F.col("dt"))).alias("w"),
        )
        .repartition("vid")
        .sortWithinPartitions("vid")
        .cache()
    )
    wadj.count()
    # static deflation column: v1 = sqrt(d) / ||sqrt(d)||
    v1n = deg.agg(F.sqrt(F.sum("d")).alias("_v1n"))
    v1 = (
        deg.crossJoin(F.broadcast(v1n))
        .select("vid", (F.sqrt(F.col("d")) / F.col("_v1n")).alias("v1"))
        .localCheckpoint(eager=True)
    )

    x = v1.select("vid", "v1", (_u01(F.col("vid"), seed) - 0.5).alias("x"))
    for _ in range(iters):
        nx = (
            wadj.join(x.select(F.col("vid"), "x"), "vid")
            .select(F.col("nbr").alias("vid"), (F.col("w") * F.col("x")).alias("c"))
            .groupBy("vid")
            .agg(F.sum("c").alias("nx"))
        )
        # lazy step (x + Nx)/2, then deflate against the static v1 and
        # L2-normalize — both as broadcast 1-row aggregates above the
        # SAME joined frame. r6: that frame is MATERIALIZED first — each
        # broadcast fold re-executes its subplan (exchange reuse does not
        # cross a BroadcastExchange boundary, the measured r4 chaining
        # lesson), so the un-cut superstep ran the join+groupBy subtree
        # three times (proj fold, nrm fold, main path). The checkpoint
        # also serves as the per-superstep lineage cut; arithmetic and
        # fold order are unchanged, so the trajectory is bit-identical.
        j = (
            x.select("vid", "v1", "x")
            .join(nx, "vid", "left")
            .select(
                "vid",
                "v1",
                (
                    (F.col("x") + F.coalesce("nx", F.lit(0.0))) / 2
                ).alias("nx"),
            )
        )
        j = checkpoint_cut(j)
        proj = j.agg(F.sum(F.col("nx") * F.col("v1")).alias("_p"))
        defl = j.crossJoin(F.broadcast(proj)).select(
            "vid", "v1", (F.col("nx") - F.col("_p") * F.col("v1")).alias("y")
        )
        nrm = defl.agg(
            F.coalesce(
                F.nullif(F.sqrt(F.sum(F.col("y") * F.col("y"))), F.lit(0.0)),
                F.lit(1.0),
            ).alias("_n")
        )
        # the state checkpoint stays: the next superstep references x
        # twice, and an un-materialized x re-evaluates its nested
        # broadcast folds per reference (measured 2.3× slower without it)
        x = (
            defl.crossJoin(F.broadcast(nrm))
            .select("vid", "v1", (F.col("y") / F.col("_n")).alias("x"))
            .localCheckpoint(eager=True)
        )
    return x.select("vid", "x")


def spectral_bipartition(
    sym_edges: DataFrame, iters: int = 8, seed: int = 42
) -> DataFrame:
    """(vid, side) — the 2-way spectral cut: side = sign of the Fiedler
    component, 6dp-rounded before the sign (engine-portable boundary),
    globally flipped so the MINIMUM vid sits on side 0 (the md5 init's
    sign is arbitrary; the flip makes output deterministic in meaning,
    not just in value)."""
    x = fiedler_vector(sym_edges, iters, seed)
    side_raw = (F.round(F.col("x"), 6) >= 0).cast("int")
    sided = x.select("vid", side_raw.alias("s"))
    anchor = sided.orderBy("vid").limit(1).select(
        F.col("s").alias("_anchor")
    )
    return sided.crossJoin(F.broadcast(anchor)).select(
        "vid",
        F.when(F.col("_anchor") == 1, 1 - F.col("s"))
        .otherwise(F.col("s"))
        .alias("side"),
    )


def partition_conductance(
    sym_edges: DataFrame, labels: DataFrame
) -> DataFrame:
    """(side, volume, cut_edges, conductance) — per-side cut quality of
    any 2-way (or k-way) labeling ``labels`` (vid, side): conductance =
    cut(S) / min(vol(S), vol(V∖S)), the objective the Fiedler cut
    approximates (Cheeger) and the number that turns spectral_bipartition
    / host binning / louvain output into a comparable layout decision.

    Shape: two label joins onto the symmetric edge table (each edge
    counted from both endpoints — so cut edges are double-counted exactly
    like volumes, and the ratio is unbiased), one groupBy(side), one
    broadcast 1-row total fold.  6dp-rounded."""
    la = labels.select(F.col("vid").alias("src"), F.col("side").alias("sa"))
    lb = labels.select(F.col("vid").alias("dst"), F.col("side").alias("sb"))
    j = sym_edges.join(la, "src").join(lb, "dst")
    per = j.groupBy(F.col("sa").alias("side")).agg(
        F.count(F.lit(1)).alias("volume"),
        F.sum((F.col("sa") != F.col("sb")).cast("long")).alias("cut_edges"),
    )
    tot = per.agg(F.sum("volume").alias("_tv"))
    return per.crossJoin(F.broadcast(tot)).select(
        "side",
        "volume",
        "cut_edges",
        F.round(
            F.col("cut_edges")
            / F.nullif(
                F.least(
                    F.col("volume"), F.col("_tv") - F.col("volume")
                ).cast("double"),
                F.lit(0.0),
            ),
            6,
        ).alias("conductance"),
    )
