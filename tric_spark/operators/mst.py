"""Minimum spanning forest — distributed Borůvka. [engine breadth: the
classic bulk-synchronous graph kernel the reference family (MPI graph
codes) ships alongside TC/CC; weights make it the backbone of
single-linkage clustering over similarity graphs.]

Algorithm (Borůvka 1926, the textbook parallel form): every component
picks its minimum-weight outgoing edge under the TOTAL order
(weight, src, dst) — the total order makes the MST unique and every pick
deterministic, so the DuckDB oracle replays the run edge-for-edge. Picked
edges join the forest; the functional graph of picks (comp → other comp)
is contracted with a 2-cycle resolve (the two components that picked each
other collapse onto the smaller id; total-order weights make every cycle
of the pick graph a 2-cycle, so the resolved map is a rooted forest with
self-loop roots) followed by pointer doubling TO FIXPOINT, like
redirects.py's resolution. Full per-round contraction is load-bearing for
correctness: with partial contraction two labels of the same merged tree
could re-expose an internal edge as "outgoing" and a non-MST edge could
win a later pick. Components at least halve per round, so ``rounds`` =
ceil(log2(n)) suffices.

Scale shape: per round ONE relabel join over the (never-materialized-
as-adjacency) edge table + ONE per-component struct-min aggregation; the
contraction joins touch only the component-count-sized pick frame, which
at least halves per round. Every state checkpoint here is
plans/lineage.py::checkpoint_cut, NOT plain localCheckpoint: this
kernel's supersteps self-join their state, and localCheckpoint carries
the origin plan's sizeInBytes onto the LogicalRDD leaf, so the estimate
SQUARES per superstep — Catalyst then grinds astronomically-sized
BigInts in every planning pass (measured: >11 driver CPU-minutes of
BigInteger.multiplyToomCook3 on a 500-vertex graph; full analysis in
plans/lineage.py). The doubling chain checkpoints every TWO steps
(4 lazy references to a cut leaf keep plans tiny; per-step checkpoints
double the action count, and superstep ACTIONS, not data, dominate this
kernel's cost). Doubling exits when the map stops changing
(~log(chain length) steps; O(log n) expected chains), bounded by
``max_doublings`` total steps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tric_spark.plans.lineage import checkpoint_cut


def minimum_spanning_forest(
    weighted_edges: DataFrame,
    rounds: int = 10,
    max_doublings: int = 16,
) -> DataFrame:
    """(src, dst, weight) — the minimum spanning forest of the undirected
    graph given as CANONICAL weighted edges (src < dst, one row per edge).
    Unique under the (weight, src, dst) total order; disconnected inputs
    yield one tree per component.
    """
    we = checkpoint_cut(
        weighted_edges.select(
            "src", "dst", F.col("weight").cast("long").alias("w")
        )
    )
    labels = checkpoint_cut(
        we.select(F.col("src").alias("vid"))
        .union(we.select(F.col("dst").alias("vid")))
        .distinct()
        .select("vid", F.col("vid").alias("comp"))
    )
    spark = weighted_edges.sparkSession
    chosen: list[DataFrame] = []

    for _ in range(rounds):
        ls = labels.select(
            F.col("vid").alias("src"), F.col("comp").alias("cs")
        )
        ld = labels.select(
            F.col("vid").alias("dst"), F.col("comp").alias("cd")
        )
        # ONE pass: candidate edges exploded into both (comp, other)
        # orientations inline — no separate cand materialization, no
        # double-reference union (superstep actions are the cost driver
        # here, not data: measured 81s -> ~half by fusing)
        both = (
            we.join(ls, "src")
            .join(ld, "dst")
            .filter(F.col("cs") != F.col("cd"))
            .select(
                F.explode(
                    F.array(
                        F.struct(
                            F.col("cs").alias("comp"),
                            F.col("cd").alias("other"),
                            "w", "src", "dst",
                        ),
                        F.struct(
                            F.col("cd").alias("comp"),
                            F.col("cs").alias("other"),
                            "w", "src", "dst",
                        ),
                    )
                ).alias("e")
            )
            .select("e.comp", "e.other", "e.w", "e.src", "e.dst")
        )
        # struct min = lexicographic (w, src, dst, other): the total order
        pick = checkpoint_cut(
            both.groupBy("comp")
            .agg(F.min(F.struct("w", "src", "dst", "other")).alias("m"))
            .select(
                "comp",
                F.col("m.w").alias("w"),
                F.col("m.src").alias("src"),
                F.col("m.dst").alias("dst"),
                F.col("m.other").alias("other"),
            )
        )
        if pick.limit(1).count() == 0:
            break
        chosen.append(pick.select("src", "dst", "w").distinct())

        # contract the functional pick graph: 2-cycle resolve, then pointer
        # doubling to fixpoint. checkpoint_cut (NOT plain localCheckpoint)
        # is load-bearing on every self-referencing step: localCheckpoint
        # preserves origin stats on the LogicalRDD leaf, and a self-join's
        # sizeInBytes estimate SQUARES per superstep — the BigInt-stats
        # bomb documented in plans/lineage.py
        p = pick.select(F.col("comp").alias("c"), F.col("other").alias("t"))
        q = p.select(F.col("c").alias("qc"), F.col("t").alias("qt"))
        r = checkpoint_cut(
            p.join(q, p["t"] == q["qc"])
            .select(
                "c",
                F.when(F.col("qt") == F.col("c"), F.least("c", "t"))
                .otherwise(F.col("t"))
                .alias("t"),
            )
        )
        # two doublings per checkpoint+convergence-check (4 lazy references
        # to the checkpointed base keep the plan/stats tiny; checking every
        # step doubles the action count for no benefit — past-fixpoint
        # doublings are idempotent on self-loop roots)
        for _ in range((max_doublings + 1) // 2):
            a = r
            for _ in range(2):
                a2 = a.select(F.col("c").alias("rc"), F.col("t").alias("rt"))
                a = a.join(a2, a["t"] == a2["rc"]).select(
                    "c", F.col("rt").alias("t")
                )
            nxt = checkpoint_cut(a)
            changed = (
                nxt.join(r.withColumnRenamed("t", "t0"), "c")
                .filter(F.col("t") != F.col("t0"))
                .limit(1)
                .count()
            )
            r = nxt
            if changed == 0:
                break
        roots = r.select(F.col("c").alias("comp"), F.col("t").alias("root"))
        labels = checkpoint_cut(
            labels.join(roots, "comp", "left")
            .select("vid", F.coalesce("root", "comp").alias("comp"))
        )

    if not chosen:
        return spark.createDataFrame([], "src long, dst long, weight long")
    out = chosen[0]
    for c in chosen[1:]:
        out = out.unionAll(c)
    return out.select("src", "dst", F.col("w").alias("weight"))


def mst_total_weight(forest: DataFrame) -> DataFrame:
    """One row (n_edges, total_weight) — the forest readout."""
    return forest.agg(
        F.count("*").alias("n_edges"),
        F.sum("weight").alias("total_weight"),
    )


def single_linkage_clusters(
    weighted_edges: DataFrame,
    threshold: int,
    rounds: int = 10,
    max_doublings: int = 16,
) -> DataFrame:
    """(vid, cluster) — single-linkage clustering cut at ``threshold``:
    the connected components of the forest edges with weight ≤ threshold
    (Gower–Ross 1969: single-linkage dendrogram = MST). Running CC over
    the FOREST (≤ n−1 edges) instead of the filtered input graph is the
    point at scale — the m-edge similarity graph collapses to n−1 rows
    before the component supersteps run. Cluster id = min member vid
    (hash-min CC convention); singletons keep their own id. Equivalence
    with CC over the τ-filtered ORIGINAL graph is what the DuckDB oracle
    checks — two different algorithms, same answer."""
    from tric_spark.operators.cc import connected_components

    forest = minimum_spanning_forest(weighted_edges, rounds, max_doublings)
    keep = forest.filter(F.col("weight") <= F.lit(threshold)).select("src", "dst")
    sym = keep.unionAll(
        keep.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    verts = (
        weighted_edges.select(F.col("src").alias("vid"))
        .union(weighted_edges.select(F.col("dst").alias("vid")))
        .distinct()
    )
    return connected_components(sym, verts).select(
        "vid", F.col("comp").alias("cluster")
    )
