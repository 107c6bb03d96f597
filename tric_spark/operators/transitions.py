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
