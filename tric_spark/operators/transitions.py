"""Event-type transition model from the event log.

The behavioral Markov chain: order each user's events by time and count
(from_type -> to_type) transitions, row-normalized into transition
probabilities.  The per-user ordering is a window partitioned BY USER —
bounded per-user state, never a global sort — with event_id as the
deterministic tie-break for simultaneous timestamps (the engine's
total-order rule, so Spark and the SQL oracle agree row for row).

The same plan shape as lm_score's token bigrams, applied to the event
stream; downstream consumers: next-event prediction baselines, anomaly
scoring (improbable transitions), funnel hypothesis generation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def event_transitions(events: DataFrame) -> DataFrame:
    """(from_type, to_type, n, p) — transition counts and row-normalized
    probabilities (6dp) over each user's time-ordered event stream."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select("user_id", "event_type", "ts", "event_id")
        .withColumn("to_type", F.lead("event_type").over(w))
        .filter(F.col("to_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = pairs.groupBy("from_type").agg(F.sum("n").alias("t"))
    return pairs.join(F.broadcast(tot), "from_type").select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n") / F.col("t"), 6).alias("p"),
    )


def stationary_distribution(events: DataFrame, iters: int = 4) -> DataFrame:
    """(event_type, pi) — the behavioral Markov chain's long-run state
    occupancy: ``iters`` fixed power-iteration steps πᵀP from uniform,
    renormalized each step (trajectory-replay convention — tol=0 fixed
    iterations so the oracle unrolls the SAME trajectory; see the
    TrustRank test-time lore).  Masses are rational n/t chains → the
    +1e-9 nudge before the 6dp readout round (midpoint lore).

    Scale shape: the chain state is |event types| rows — every superstep
    is a tiny broadcast-sized join; the only data-sized work is the one
    transition-count pass (same plan as :func:`event_transitions`).
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select("user_id", "event_type", "ts", "event_id")
        .withColumn("to_type", F.lead("event_type").over(w))
        .filter(F.col("to_type").isNotNull())
        .groupBy(F.col("event_type").alias("from_type"), "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = pairs.groupBy("from_type").agg(F.sum("n").alias("t"))
    probs = (
        pairs.join(tot, "from_type")
        .select("from_type", "to_type", (F.col("n") / F.col("t")).alias("p"))
        .localCheckpoint(eager=True)
    )
    states = (
        probs.select(F.col("from_type").alias("s"))
        .unionAll(probs.select("to_type"))
        .distinct()
    )
    ns = states.agg(F.count(F.lit(1)).alias("k"))
    pi = states.crossJoin(F.broadcast(ns)).select(
        "s", (F.lit(1.0) / F.col("k")).alias("pi")
    )
    for _ in range(iters):
        nxt = (
            probs.join(pi.withColumnRenamed("s", "from_type"), "from_type")
            .groupBy(F.col("to_type").alias("s"))
            .agg(F.sum(F.col("pi") * F.col("p")).alias("m"))
        )
        z = nxt.agg(F.sum("m").alias("z"))
        pi = (
            nxt.crossJoin(F.broadcast(z))
            .select("s", (F.col("m") / F.col("z")).alias("pi"))
            .localCheckpoint(eager=True)
        )
    return pi.select(
        F.col("s").alias("event_type"),
        F.round(F.col("pi") + F.lit(1e-9), 6).alias("pi"),
    )
