"""Truncated hitting times to a target set — absorbing-random-walk value
iteration. [north-rule family: walk-distance companion to TrustRank —
"how many random clicks from here to a trusted/spam seed?"]

h_v = expected number of uniform-random-walk steps from v until the walk
first enters the target set T, TRUNCATED at ``iters`` steps:

    h^0 = 0;   h^{t+1}_v = 0                      if v ∈ T
               h^{t+1}_v = 1 + avg_{u∈N(v)} h^t_u otherwise

By induction h^t_v = E[min(τ_v, t)] — a well-defined finite readout even
when T is unreachable from v (value saturates at ``iters``), which is
why the truncated form, not the fixpoint, is the distributed kernel of
choice (the untruncated system is singular on graphs with unreachable
parts). Monotone nondecreasing in t, exact for vertices whose walks
always absorb within ``iters``.

Semantics: standard absorbing-chain first-passage truncation (Kemeny &
Snell, Finite Markov Chains, ch. 3; value-iteration form). Not in the
reference (tric counts triangles); this is engine breadth for the
link-spam / seed-distance family (TrustRank's seed sets, trustrank.py).

Scale shape: one superstep = ONE equi-join of the m-row symmetric edge
table against the n-row state + a map-side-partial avg groupBy — the
PageRank shuffle, with `localCheckpoint` per superstep (CLAUDE.md rule;
single-reference step, so plain checkpoint suffices — no origin-stats
squaring). The target flag rides IN the checkpointed state (the PPR
(vid, rank, e) lesson — no per-step join against a cached frame).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hitting_times(
    sym_edges: DataFrame,
    targets: DataFrame,
    iters: int = 8,
) -> DataFrame:
    """(vid, h) over every vertex of ``sym_edges`` (both directions
    present); ``targets``: DataFrame with a ``vid`` column. ``h`` is the
    ``iters``-truncated expected hitting time, full precision (callers
    round for portability)."""
    edges = sym_edges.select("src", "dst")
    verts = edges.select(F.col("src").alias("vid")).distinct()
    state = (
        verts.join(
            targets.select("vid").distinct().withColumn("_t", F.lit(True)),
            "vid",
            "left",
        )
        .select(
            "vid",
            F.lit(0.0).alias("h"),
            F.coalesce(F.col("_t"), F.lit(False)).alias("is_t"),
        )
        .localCheckpoint(eager=True)
    )
    for _ in range(iters):
        nbr_avg = (
            edges.join(
                state.select(F.col("vid").alias("dst"), "h"), "dst"
            )
            .groupBy(F.col("src").alias("vid"))
            .agg(F.avg("h").alias("_a"))
        )
        state = (
            state.select("vid", "is_t")
            .join(nbr_avg, "vid")
            .select(
                "vid",
                F.when(F.col("is_t"), F.lit(0.0))
                .otherwise(1.0 + F.col("_a"))
                .alias("h"),
                "is_t",
            )
            .localCheckpoint(eager=True)
        )
    return state.select("vid", "h")
