"""Redirect-chain resolution via pointer doubling. [north-rule family:
crawl-graph normalization — collapse 301/canonical chains before link
analysis]

Every web crawl carries redirect chains (u → v → w → terminal); link
analysis wants each source mapped to its terminal target so rank mass
lands on the canonical page. Chasing chains one hop per superstep is
O(longest chain); pointer doubling (the classic parallel list-ranking
technique — Wyllie 1979, the same trick hash-min CC's star steps build on)
squares the jump each round: after r rounds every pointer has advanced
2^r hops, so O(log chain) shuffles total.

Spark shape per round: ONE self-join of the jump table on its own target
column (j'(v) = j(j(v)) where defined, else j(v)), eagerly checkpointed;
an any-row-changed scalar aggregate is the stop test (one action per
round, like the rank kernels' convergence mode). Cycles (redirect loops —
real crawls have them) never terminate, so the loop is bounded and rows
whose final target is still a redirect source are flagged ``resolved =
false`` — after ``max_doublings`` rounds those are exactly the loop
members (any chain ≤ 2^max_doublings hops has been collapsed).

At 10^12 scale: the jump table holds only redirect sources (a small
fraction of pages), both join sides are the same frame hash-partitioned
on the join key, and the round count is log₂ of the longest chain — ~40
rounds covers any chain the web can physically contain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tric_spark.plans.lineage import checkpoint_cut


def resolve_redirects(
    redirects: DataFrame, max_doublings: int = 40
) -> DataFrame:
    """(src, final, resolved) — each redirect source mapped to the end of
    its chain. ``redirects`` is (src, dst); a src with several rows keeps
    the min dst (deterministic normalization of a malformed input).
    ``resolved`` is false only for members of redirect cycles (their
    ``final`` is the deterministic 2^max_doublings-hop jump, matching the
    unrolled oracle)."""
    j = checkpoint_cut(
        redirects.groupBy("src").agg(F.min("dst").alias("cur"))
    )
    for _ in range(max_doublings):
        hop = j.select(F.col("src").alias("cur"), F.col("cur").alias("_nxt"))
        # checkpoint_cut, not localCheckpoint: this left-outer SELF-join
        # squares the carried sizeInBytes estimate per doubling, and a
        # non-settling cycle (any odd length) runs all max_doublings steps
        # -> 63*2^40-bit BigInts in the optimizer (plans/lineage.py)
        nxt = checkpoint_cut(
            j.join(hop, "cur", "left")
            .select("src", F.coalesce("_nxt", "cur").alias("cur"))
        )
        settled = (
            j.select("src", F.col("cur").alias("_old"))
            .join(nxt, "src")
            .filter(F.col("cur") != F.col("_old"))
            .isEmpty()
        )
        j = nxt
        if settled:
            break
    srcs = j.select(F.col("src").alias("cur")).distinct().withColumn(
        "_is_src", F.lit(True)
    )
    return j.join(srcs, "cur", "left").select(
        "src",
        F.col("cur").alias("final"),
        F.coalesce(~F.col("_is_src"), F.lit(True)).alias("resolved"),
    )
