"""Maximal independent set via Luby's algorithm, hash-deterministic.
[north-rule family: the classic symmetry-breaking primitive for massive
graphs — scheduling, landmark/pivot selection, graph coloring's inner
step]

Luby (SIAM J. Comput. 15(4), 1986): each round every still-active vertex
draws a random priority; strict local minima join the MIS, they and their
neighbors deactivate. O(log n) rounds w.h.p., every round one shuffle.

Determinism (the engine-wide rule — df.sample-style randomness is
parallelism-dependent and un-oracle-able): round r's priority is the full
md5 hex of "mis:{seed}:{r}:{vid}" — a pure function of (seed, round, vid),
identical at any parallelism and replayable verbatim in DuckDB. Distinct
vids give distinct preimages, so priority ties cannot occur short of an
md5 collision; comparison is plain ASCII string order on both engines.

Spark shape per round: priorities are an expression over the active-vertex
frame (no extra pass); neighbor-min is one map-side-combined
groupBy(src).min(p) over the active edge list; winners = left join +
filter (no active neighbor → automatic winner, which also guarantees
termination: the global minimum always wins, and isolated vertices join
immediately). Active frontier and edge list shrink monotonically and are
eagerly checkpointed per round (lineage rule); the MIS accumulates as a
union of per-round checkpointed winner frames (O(log n) blocks).

At 10^12 scale: state is the active vertex/edge lists only — after a few
rounds both are a small fraction of the graph; the shuffles are keyed on
vid and co-locate round over round.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _priority(vid: Column, seed: int, rnd: int) -> Column:
    return F.md5(
        F.concat_ws(
            ":", F.lit("mis"), F.lit(str(seed)), F.lit(str(rnd)), vid.cast("string")
        )
    )


def maximal_independent_set(
    sym_edges: DataFrame,
    vertices: DataFrame,
    seed: int = 42,
    max_rounds: int = 64,
) -> DataFrame:
    """(vid) — a maximal independent set of the UNDIRECTED graph
    (``sym_edges`` holds both orientations; self-loops must be pre-dropped,
    the engine's canonical-edges guarantee). Deterministic for a given
    ``seed`` at any parallelism. ``max_rounds`` bounds the unrolled-oracle
    replay (Luby needs O(log n) rounds; if the bound is hit the result is
    still independent, just possibly not maximal — pass the default 64 for
    guaranteed-maximal at any real scale)."""
    active = vertices.select("vid").distinct().localCheckpoint(eager=True)
    edges = sym_edges.select("src", "dst").localCheckpoint(eager=True)
    winners_acc: list[DataFrame] = []
    for rnd in range(max_rounds):
        if active.isEmpty():
            break
        pri = active.select("vid", _priority(F.col("vid"), seed, rnd).alias("p"))
        nbr_min = (
            edges.join(
                pri.select(F.col("vid").alias("dst"), F.col("p").alias("dp")), "dst"
            )
            .groupBy("src")
            .agg(F.min("dp").alias("np"))
            .withColumnRenamed("src", "vid")
        )
        win = (
            pri.join(nbr_min, "vid", "left")
            .filter(F.col("np").isNull() | (F.col("p") < F.col("np")))
            .select("vid")
            .localCheckpoint(eager=True)
        )
        winners_acc.append(win)
        # deactivate winners and their neighbors; shrink the edge list to
        # the surviving actives on BOTH endpoints
        nbrs = (
            edges.join(win.withColumnRenamed("vid", "src"), "src")
            .select(F.col("dst").alias("vid"))
            .distinct()
        )
        removed = win.union(nbrs)
        active = active.join(removed, "vid", "left_anti").localCheckpoint(eager=True)
        edges = (
            edges.join(active.withColumnRenamed("vid", "src"), "src", "left_semi")
            .join(active.withColumnRenamed("vid", "dst"), "dst", "left_semi")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
    if not winners_acc:
        return vertices.select("vid").limit(0)
    mis = winners_acc[0]
    for w in winners_acc[1:]:
        mis = mis.union(w)
    return mis


def jones_plassmann_coloring(
    sym_edges: DataFrame,
    vertices: DataFrame,
    seed: int = 42,
    max_rounds: int = 64,
) -> DataFrame:
    """(vid, color) — a proper vertex coloring by the Jones–Plassmann
    algorithm (SIAM J. Sci. Comput. 14(3), 1993), the distributed-coloring
    standard built on the same symmetry-breaking idea as Luby's MIS: every
    vertex draws ONE static hash priority; a vertex colors itself the round
    all its higher-priority neighbors are colored, taking the mex (smallest
    color unused by its already-colored neighbors). Expected O(log n /
    log log n) rounds; colors ≤ Δ+1.

    Determinism: priority = md5("col:{seed}:{vid}") — distinct vids give
    distinct hex strings, so adjacent vertices can never be ready in the
    same round (strict-minimum rule), which is the proper-coloring
    invariant. The mex is an expression over the sorted distinct neighbor
    colors (first index where value ≠ index — one of the two legitimate
    uses of F.transform's (element, index) lambda form).

    Spark shape per round: the uncolored-edge list shrinks like MIS's;
    neighbor-min is one groupBy, the colored-neighbor color sets one more
    (collect_set bounded by vertex degree), both map-side combined;
    everything checkpointed per round."""
    pri_col = F.md5(
        F.concat_ws(":", F.lit("col"), F.lit(str(seed)), F.col("vid").cast("string"))
    )
    uncolored = (
        vertices.select("vid").distinct().select("vid", pri_col.alias("p"))
        .localCheckpoint(eager=True)
    )
    all_edges = sym_edges.select("src", "dst").localCheckpoint(eager=True)
    ue = all_edges
    colored_acc: list[DataFrame] = []
    colored = None
    for _ in range(max_rounds):
        if uncolored.isEmpty():
            break
        nbr_min = (
            ue.join(
                uncolored.select(F.col("vid").alias("dst"), F.col("p").alias("dp")),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("dp").alias("np"))
            .withColumnRenamed("src", "vid")
        )
        ready = (
            uncolored.join(nbr_min, "vid", "left")
            .filter(F.col("np").isNull() | (F.col("p") < F.col("np")))
            .select("vid")
        )
        if colored is None:
            ncols = ready.select("vid", F.array().cast("array<int>").alias("cs"))
        else:
            got = (
                all_edges.join(ready.withColumnRenamed("vid", "src"), "src")
                .join(
                    colored.select(
                        F.col("vid").alias("dst"), F.col("color").alias("c")
                    ),
                    "dst",
                )
                .groupBy("src")
                .agg(F.array_sort(F.collect_set("c")).alias("cs"))
                .withColumnRenamed("src", "vid")
            )
            ncols = ready.join(got, "vid", "left").select(
                "vid", F.coalesce("cs", F.array().cast("array<int>")).alias("cs")
            )
        # mex: first index where sorted-distinct value ≠ index, else size
        mex = F.coalesce(
            F.array_min(
                F.filter(
                    F.transform(
                        "cs", lambda x, i: F.when(x != i.cast("int"), i.cast("int"))
                    ),
                    lambda x: x.isNotNull(),
                )
            ),
            F.size("cs"),
        )
        newly = ncols.select("vid", mex.alias("color")).localCheckpoint(eager=True)
        colored_acc.append(newly)
        colored = newly if colored is None else colored.union(newly).localCheckpoint(
            eager=True
        )
        uncolored = uncolored.join(newly.select("vid"), "vid", "left_anti").localCheckpoint(
            eager=True
        )
        ue = (
            all_edges.join(uncolored.select(F.col("vid").alias("src")), "src", "left_semi")
            .join(uncolored.select(F.col("vid").alias("dst")), "dst", "left_semi")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
    if colored is None:
        return vertices.select("vid").limit(0).withColumn("color", F.lit(0))
    return colored
