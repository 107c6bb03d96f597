"""Data-profiling operators over the event log — the "what's actually in
this table" pass every pipeline runs before trusting a new feed.

- :func:`json_schema_profile`: per-key presence/cardinality/type stats of
  a semi-structured JSON column (the schema-inference dashboard).
- :func:`interarrival_quantiles`: per-event-type inter-arrival time
  percentiles (the feed-health / burstiness readout).

Both stay JVM-side: ``from_json`` to a string map + one explode for the
profiler; a per-(user,type) lag window (bounded per-user state, no global
sort) + the exact value-histogram percentile method
(textstats.exact_quantiles_by) for the gaps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def json_schema_profile(df: DataFrame, json_col: str = "props") -> DataFrame:
    """(key, n_present, n_distinct, frac_int) per top-level JSON key.
    Values profile as strings (JSON scalars coerce the same way in
    Spark's map<string,string> parse and DuckDB's json_extract_string);
    frac_int = share matching ^-?[0-9]+$ — 6dp."""
    kv = (
        df.filter(F.col(json_col).isNotNull())
        .select(
            F.explode(
                F.from_json(F.col(json_col), "map<string,string>")
            ).alias("key", "val")
        )
    )
    return kv.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_present"),
        F.countDistinct("val").alias("n_distinct"),
        F.round(
            F.avg(
                F.when(F.col("val").rlike("^-?[0-9]+$"), 1.0).otherwise(0.0)
            ),
            6,
        ).alias("frac_int"),
    )


def interarrival_quantiles(
    events: DataFrame, pcts: tuple[int, ...] = (50, 90, 99)
) -> DataFrame:
    """(event_type, pct, value) — exact percentiles of the per-user
    inter-arrival gap (whole seconds, truncated from exact microseconds)
    between consecutive events of the same type.  Truncating to seconds
    bounds the value-histogram cardinality the percentile method sorts
    (exact_quantiles' documented trade).  NULL users are excluded."""
    from tric_spark.operators.textstats import exact_quantiles_by

    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    # NTZ -> LTZ cast is value-stable (session TZ pinned UTC);
    # unix_micros keeps the sub-second part exact before the integer div
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gaps = (
        events.filter(F.col("user_id").isNotNull())
        .select("user_id", "event_type", "ts", "event_id", us.alias("us"))
        .withColumn("prev_us", F.lag("us").over(w))
        .filter(F.col("prev_us").isNotNull())
        .select(
            "event_type",
            F.expr("(us - prev_us) div 1000000").alias("gap_s"),
        )
    )
    return exact_quantiles_by(gaps, "event_type", "gap_s", pcts=pcts).select(
        F.col("key").alias("event_type"), "pct", "value"
    )
