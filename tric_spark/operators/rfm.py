"""RFM (recency / frequency / monetary) user segmentation over the event
log — the classic behavioral-cohort analysis: score every user 1-4 on how
recently they acted, how often, and how much value they generated, then
report the segment grid.

Scale shape: NO global ntile window (a single-partition sort of every
user).  Quartile thresholds come from the exact value-histogram
cumulative-rank method (textstats.exact_quantiles — percentile_disc
semantics, window bounded by value cardinality), shipped as three 1-row
broadcast frames; scoring is then a map-only comparison and the grid is
one map-side-combinable groupBy.  Deterministic across engines: monetary
is ROUNDED to 6dp before thresholding (rank-on-the-rounded-key rule, see
sampling.py), recency/frequency are exact types.

Scale note: the monetary value-histogram cardinality approaches the user
count (6dp sums rarely collide), so its cumulative window sees ~n_users
rows in one partition — exact_quantiles' documented trade.  At web scale
round monetary coarser (cents) before calling; that collapses the
histogram by orders of magnitude without moving any quartile materially.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _quartiles(per_user: DataFrame, col: str):
    """1-row (q1, q2, q3) frame: exact 25/50/75th percentiles of
    ``per_user[col]`` by the cum-rank >= ceil(p·n) rule."""
    counts = per_user.groupBy(F.col(col).alias("v")).agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = counts.select("v", F.sum("c").over(w).alias("cum"))
    tot = per_user.agg(F.count(F.lit(1)).alias("n"))
    return (
        cum.crossJoin(F.broadcast(tot))
        .agg(
            *[
                F.min(
                    F.when(
                        F.col("cum") >= F.ceil(F.lit(p) * F.col("n")), F.col("v")
                    )
                ).alias(f"q{i}")
                for i, p in ((1, 0.25), (2, 0.50), (3, 0.75))
            ]
        )
    )


def rfm_segments(events: DataFrame) -> DataFrame:
    """(r_score, f_score, m_score, n_users, avg_monetary): the RFM grid.

    score = 1 + [x > q25] + [x > q50] + [x > q75] of the per-user metric
    distribution (4 = top quartile).  NULL user_ids are excluded; NULL
    values sum as 0 monetary.
    """
    per_user = (
        events.filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(
            F.max("ts").alias("rec"),
            F.count(F.lit(1)).alias("freq"),
            F.round(F.coalesce(F.sum("value"), F.lit(0.0)), 6).alias("mon"),
        )
        .localCheckpoint(eager=True)  # feeds 3 threshold plans + scoring
    )

    def score(col: str, q) -> F.Column:
        return (
            F.lit(1)
            + F.when(F.col(col) > q.q1, 1).otherwise(0)
            + F.when(F.col(col) > q.q2, 1).otherwise(0)
            + F.when(F.col(col) > q.q3, 1).otherwise(0)
        )

    qr = _quartiles(per_user, "rec").toDF("rq1", "rq2", "rq3")
    qf = _quartiles(per_user, "freq").toDF("fq1", "fq2", "fq3")
    qm = _quartiles(per_user, "mon").toDF("mq1", "mq2", "mq3")

    class _Q:  # tiny column-triple holder for score()
        def __init__(self, a, b, c):
            self.q1, self.q2, self.q3 = F.col(a), F.col(b), F.col(c)

    scored = (
        per_user.crossJoin(F.broadcast(qr))
        .crossJoin(F.broadcast(qf))
        .crossJoin(F.broadcast(qm))
        .select(
            score("rec", _Q("rq1", "rq2", "rq3")).alias("r_score"),
            score("freq", _Q("fq1", "fq2", "fq3")).alias("f_score"),
            score("mon", _Q("mq1", "mq2", "mq3")).alias("m_score"),
            "mon",
        )
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.round(F.avg("mon"), 6).alias("avg_monetary"),
    )
