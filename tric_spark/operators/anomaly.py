"""Event-rate anomaly detection — rolling z-scores over hourly counts.
[relational-checklist family: the window-frame exerciser with an
operational use — the monitor a crawl/ingest pipeline runs over its own
event stream to flag rate spikes and droughts]

Shape: one groupBy to hourly (ts_hour, event_type) counts, then ONE
window pass per series — mean/stddev over the trailing ``window_hours``
buckets EXCLUDING the current one (``rowsBetween(-window_hours, -1)``),
z = (n − μ)/σ. Rows with fewer than ``min_history`` trailing buckets or
σ = 0 get NULL z (insufficient evidence ≠ anomaly). All JVM window
expressions; the partition key is event_type so a year of hourly buckets
per series is a few thousand rows per partition — trivially balanced at
any scale (series count is the parallelism, not time).

Determinism: counts are exact, stddev is the sample estimator on both
engines (Spark ``stddev`` == DuckDB ``stddev_samp``), z rounded 6dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hourly_counts(events: DataFrame) -> DataFrame:
    """(ts_hour, event_type, n) — exact hourly event counts."""
    return (
        events.select(
            F.date_trunc("hour", F.col("ts")).alias("ts_hour"), "event_type"
        )
        .groupBy("ts_hour", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def rate_anomalies(
    events: DataFrame,
    window_hours: int = 12,
    min_history: int = 4,
    z_thresh: float = 3.0,
) -> DataFrame:
    """(ts_hour, event_type, n, mu, sigma, z, is_anomaly) per hourly
    bucket. ``mu``/``sigma`` describe the trailing window only (never the
    current bucket — a spike must not mask itself); NULL z where history
    is short or flat."""
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts_hour")
        .rowsBetween(-window_hours, -1)
    )
    hc = hourly_counts(events)
    stats = hc.select(
        "ts_hour",
        "event_type",
        "n",
        F.count(F.lit(1)).over(w).alias("hist"),
        F.round(F.avg("n").over(w), 6).alias("mu"),
        F.round(F.stddev("n").over(w), 6).alias("sigma"),
    )
    z = F.when(
        (F.col("hist") >= min_history) & (F.col("sigma") > 0),
        F.round((F.col("n") - F.col("mu")) / F.col("sigma"), 6),
    )
    return stats.select(
        "ts_hour",
        "event_type",
        "n",
        "mu",
        "sigma",
        z.alias("z"),
        (F.abs(z) >= z_thresh).alias("is_anomaly"),
    )


def daily_retention(events: DataFrame) -> DataFrame:
    """(day, n_active, n_retained, retention) — day-over-day returning
    users: of the distinct users active on ``day``, how many were also
    active the previous calendar day. The standard engagement/cohort
    readout a crawl or serving pipeline computes over its event log.

    Shape: ONE distinct over (day, user) — the only big shuffle — then a
    self-join of that deduped frame against itself shifted by one day
    (both sides hash-partitioned on the same (day, user_id) key, so AQE
    plans a co-partitioned join, no re-shuffle), and per-day counts.
    ``day`` is emitted as an ISO string so the DuckDB replay compares
    text, not engine-specific date dtypes. Day 1 of the log reports 0
    retained (no prior day), not NULL."""
    du = (
        events.select(F.to_date("ts").alias("day"), "user_id")
        .distinct()
        .cache()
    )
    prev = du.select(
        F.date_add("day", 1).alias("day"), F.col("user_id")
    )
    act = du.groupBy("day").agg(F.count(F.lit(1)).alias("n_active"))
    ret = (
        du.join(prev, ["day", "user_id"])
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n_retained"))
    )
    return (
        act.join(ret, "day", "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_active",
            F.coalesce("n_retained", F.lit(0)).alias("n_retained"),
            F.round(
                F.coalesce("n_retained", F.lit(0)) / F.col("n_active"), 6
            ).alias("retention"),
        )
    )


def cohort_retention(events: DataFrame, unit: str = "week") -> DataFrame:
    """(cohort, period_offset, n_users, retention) — the classic cohort matrix:
    users grouped by their first-activity period (ISO ``unit`` truncation,
    Monday weeks), columns count who was active again ``period_offset`` periods
    later, retention = share of the cohort (6dp).

    Offsets come from exact day arithmetic on truncated periods
    (days-difference div period-length — truncated inputs make the
    division exact, no engine-specific "week boundary" semantics).  Two
    groupBys + one join; output cardinality = periods², never data-sized.
    NULL users are excluded."""
    days = {"week": 7, "day": 1}[unit]
    ev = events.filter(F.col("user_id").isNotNull()).select(
        "user_id", F.date_trunc(unit, F.col("ts")).alias("p")
    )
    first = ev.groupBy("user_id").agg(F.min("p").alias("cohort"))
    act = ev.distinct()
    joined = act.join(first, "user_id").select(
        "user_id",
        "cohort",
        F.expr(
            f"datediff(to_date(p), to_date(cohort)) div {days}"
        ).alias("period_offset"),
    )
    m = joined.groupBy("cohort", "period_offset").agg(
        F.countDistinct("user_id").alias("n_users")
    )
    size = m.filter(F.col("period_offset") == 0).select(
        "cohort", F.col("n_users").alias("c0")
    )
    return m.join(size, "cohort").select(
        "cohort",
        "period_offset",
        "n_users",
        F.round(F.col("n_users") / F.col("c0"), 6).alias("retention"),
    )


def user_activity_entropy(events: DataFrame) -> DataFrame:
    """(user_id, n_events, n_types, entropy) — per-user Shannon entropy
    (nats) of the event-type mix: H = ln(n) − (Σ c·ln c)/n.  The
    behavioral-diversity bot signal (scripted accounts hammer one event
    type → entropy ≈ 0 at high volume; lexical_diversity's exact shape
    applied to the event stream).  One groupBy(user, type) with map-side
    partial counts + one per-user aggregate; ln is natural log in BOTH
    engines (DuckDB log() is base-10 — engine lore).  NULL users
    excluded; 6dp."""
    tf = (
        events.filter(F.col("user_id").isNotNull())
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        tf.groupBy("user_id")
        .agg(
            F.sum("c").alias("n_events"),
            F.count(F.lit(1)).alias("n_types"),
            F.sum(F.col("c") * F.log("c")).alias("_clc"),
        )
        .select(
            "user_id",
            "n_events",
            "n_types",
            F.round(
                F.log("n_events") - F.col("_clc") / F.col("n_events"), 6
            ).alias("entropy"),
        )
    )
