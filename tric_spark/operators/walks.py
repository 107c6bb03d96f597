"""Deterministic seeded random walks over the link graph — the sampling
primitive behind node2vec/DeepWalk-style embedding corpora and Monte-Carlo
PageRank. Not in the reference (tric counts triangles only); engine
breadth for the training-data-pipeline tier.

Determinism is the design center: the neighbor chosen at step t of walk w
standing on vertex v is

    idx = int(hex(md5("w:{seed}:{w}:{t}:{v}"))[0:6], 16) mod deg(v)
    next = sorted_neighbors(v)[idx]

a pure function of (seed, walk, step, position) — the same walk table
materializes at ANY parallelism (the reference's parallel-LCG determinism
invariant, utils.hpp:200–385, carried to walks), re-runs are reproducible,
and the DuckDB oracle replays every hop exactly (md5 + hex parse are
engine-portable; 6 hex digits < 2^24 so the mod is exact int math).

Scale shape: the adjacency (vid, sorted nbrs, deg) is built ONCE and
cached; per step only the walk-position state (one row per walk) joins it
— shuffle on the position key, hash-partitioned, AQE-skew-split on hub
positions. The trajectory rides INSIDE the state as a growing array (row
width O(steps), never a per-step output union whose lazy tails would
re-execute the join chain), steps chain lazily between periodic
localCheckpoints (the lineage rule every iterative kernel here follows),
and one posexplode at the end yields the (walk_id, step, vid) rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _step_hash(walk_id, t: int, cur, seed: int):
    """First 6 hex digits of md5("w:{seed}:{walk}:{t}:{vid}") as int64 —
    replayed verbatim by the oracle SQL."""
    s = F.concat_ws(
        ":", F.lit("w"), F.lit(str(seed)), walk_id.cast("string"),
        F.lit(str(t)), cur.cast("string"),
    )
    return F.conv(F.substring(F.md5(s), 1, 6), 16, 10).cast("long")


def random_walks(
    sym_edges: DataFrame,
    num_steps: int = 4,
    starts: DataFrame | None = None,
    seed: int = 42,
    chain: int = 4,
) -> DataFrame:
    """(walk_id, step, vid) trajectories: one walk per start vertex,
    ``num_steps`` uniform hops over the symmetric adjacency (sorted
    neighbor lists, md5-seeded index — see module docstring).

    ``starts`` defaults to every vertex with at least one edge (walks from
    an isolated vertex have nowhere to go; on the symmetric graph every
    non-isolated position always has a next hop, so all walks run the full
    ``num_steps``). step is int64 0..num_steps, step 0 = the start itself.
    """
    adj = (
        sym_edges.groupBy(F.col("src").alias("vid"))
        .agg(
            F.array_sort(F.collect_list("dst")).alias("nbrs"),
            F.count("*").alias("deg"),
        )
        .cache()
    )
    if starts is None:
        starts = adj.select("vid")
    state = starts.select(
        F.col("vid").alias("walk_id"),
        F.col("vid").alias("cur"),
        F.array(F.col("vid")).alias("path"),
    ).localCheckpoint(eager=True)

    for t in range(1, num_steps + 1):
        idx = F.pmod(_step_hash(F.col("walk_id"), t, F.col("cur"), seed), F.col("deg"))
        nxt = F.element_at("nbrs", (idx + 1).cast("int"))
        state = (
            state.join(adj, state["cur"] == adj["vid"])
            .select(
                "walk_id",
                nxt.alias("cur"),
                F.array_append("path", nxt).alias("path"),
            )
        )
        if t % chain == 0 or t == num_steps:
            state = state.localCheckpoint(eager=True)

    return state.select(
        "walk_id", F.posexplode("path").alias("step", "vid")
    ).select("walk_id", F.col("step").cast("long").alias("step"), "vid")
