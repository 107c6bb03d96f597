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
at least halves per round. EVERY doubling step is eagerly checkpointed —
leaving the chain lazy squares the plan per step and Catalyst's
SizeInBytesOnlyStatsPlanVisitor then multiplies BigInt sizeInBytes over
the exponential tree (measured: the driver ground >11 CPU-minutes of
BigInteger.multiplyToomCook3 on an 80-vertex graph before this fix).
Doubling exits when the map stops changing (~log(chain length) steps;
O(log n) expected chains), bounded by ``max_doublings``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
    we = weighted_edges.select(
        "src", "dst", F.col("weight").cast("long").alias("w")
    ).localCheckpoint(eager=True)
    labels = (
        we.select(F.col("src").alias("vid"))
        .union(we.select(F.col("dst").alias("vid")))
        .distinct()
        .select("vid", F.col("vid").alias("comp"))
        .localCheckpoint(eager=True)
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
        cand = (
            we.join(ls, "src")
            .join(ld, "dst")
            .filter(F.col("cs") != F.col("cd"))
            .localCheckpoint(eager=True)
        )
        if cand.limit(1).count() == 0:
            break
        both = cand.select(
            F.col("cs").alias("comp"), F.col("cd").alias("other"),
            "w", "src", "dst",
        ).unionAll(
            cand.select(
                F.col("cd").alias("comp"), F.col("cs").alias("other"),
                "w", "src", "dst",
            )
        )
        # struct min = lexicographic (w, src, dst, other): the total order
        pick = (
            both.groupBy("comp")
            .agg(F.min(F.struct("w", "src", "dst", "other")).alias("m"))
            .select(
                "comp",
                F.col("m.w").alias("w"),
                F.col("m.src").alias("src"),
                F.col("m.dst").alias("dst"),
                F.col("m.other").alias("other"),
            )
            .localCheckpoint(eager=True)
        )
        chosen.append(pick.select("src", "dst", "w").distinct())

        # contract the functional pick graph: 2-cycle resolve, then pointer
        # doubling to fixpoint (checkpoint EVERY step — lazy doubling is a
        # Catalyst BigInt-stats bomb, see module docstring)
        p = pick.select(F.col("comp").alias("c"), F.col("other").alias("t"))
        q = p.select(F.col("c").alias("qc"), F.col("t").alias("qt"))
        r = (
            p.join(q, p["t"] == q["qc"])
            .select(
                "c",
                F.when(F.col("qt") == F.col("c"), F.least("c", "t"))
                .otherwise(F.col("t"))
                .alias("t"),
            )
            .localCheckpoint(eager=True)
        )
        for _ in range(max_doublings):
            r2 = r.select(F.col("c").alias("rc"), F.col("t").alias("rt"))
            nxt = (
                r.join(r2, r["t"] == r2["rc"])
                .select("c", F.col("rt").alias("t"))
                .localCheckpoint(eager=True)
            )
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
        labels = (
            labels.join(roots, "comp", "left")
            .select(
                "vid", F.coalesce("root", "comp").alias("comp")
            )
            .localCheckpoint(eager=True)
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
