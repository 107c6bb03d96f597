"""Ordered funnel analysis over the event log.

The product-analytics staple: of the users who did stage 1, how many went
on to do stage 2 AFTER it, then stage 3 after that?  A user converts
through stage i when there exists an occurrence of stage i's event type
strictly after their conversion time for stage i−1; the conversion time is
the EARLIEST such occurrence (the greedy/minimal witness, which is the
standard semantics and makes the result order-independent and exactly
replayable in SQL).

Spark shape: one pass filters to the funnel's event types, one groupBy
(user, stage-index) keeps min/“min after prev” via an iterated min-join —
``len(stages)`` is a small constant (3–5), so the plan is a fixed chain of
per-user aggregates, each map-side combined, never a per-user sort of the
full event history.  Output is one row per stage: users reaching it,
conversion from the previous stage, and conversion from the top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame, stages: list[str], max_gap_s: int | None = None
) -> DataFrame:
    """(stage_idx, stage, n_users, conv_from_prev, conv_from_first) for
    the ordered ``stages`` (event_type values).

    ``max_gap_s``: optional conversion window — stage i counts only when
    its earliest witness falls within this many seconds AFTER stage
    i−1's conversion time (the "converted within the hour" product
    question).  Timestamp+interval arithmetic is exact integer
    microseconds, so the windowed variant replays in SQL bit-for-bit."""
    if len(stages) < 2:
        raise ValueError("a funnel needs at least 2 stages")
    ev = events.filter(F.col("event_type").isin(stages)).select(
        "user_id", "event_type", "ts"
    )
    # stage 1: earliest occurrence per user
    cur = (
        ev.filter(F.col("event_type") == stages[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t"))
        .localCheckpoint(eager=True)
    )
    counts = [cur.count()]
    for s in stages[1:]:
        cond = F.col("ts") > F.col("t")
        if max_gap_s is not None:
            cond = cond & (
                F.col("ts")
                <= F.col("t") + F.expr(f"INTERVAL {int(max_gap_s)} SECONDS")
            )
        nxt = (
            ev.filter(F.col("event_type") == s)
            .join(cur, "user_id")
            .filter(cond)
            .groupBy("user_id")
            .agg(F.min("ts").alias("t"))
            .localCheckpoint(eager=True)
        )
        counts.append(nxt.count())
        cur = nxt
    spark = events.sparkSession
    rows = []
    for i, (s, n) in enumerate(zip(stages, counts)):
        prev = counts[i - 1] if i else counts[0]
        rows.append(
            (
                i + 1,
                s,
                n,
                round(n / prev, 6) if prev else None,
                round(n / counts[0], 6) if counts[0] else None,
            )
        )
    return spark.createDataFrame(
        rows,
        "stage_idx int, stage string, n_users long,"
        " conv_from_prev double, conv_from_first double",
    )
