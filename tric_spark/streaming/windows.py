"""Structured Streaming operators over event streams.

The reference is batch-only (its only iteration state is comm-buffer resume
cursors, SURVEY §2.4); streaming here extends the engine surface for the
event tables the driver ships. Semantics:

- tumbling/sliding window aggregation with an event-time watermark for late
  data (`late_threshold`);
- the same logical aggregation works identically on a static DataFrame (the
  unified batch/stream contract of Structured Streaming) — the tests run the
  stream with ``availableNow`` and compare against the batch plan on the
  same input.

At scale: the aggregation state is partitioned by (window, group key); the
watermark bounds state size — without it the store grows unboundedly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    late_threshold: str = "30 minutes",
    streaming: bool | None = None,
) -> DataFrame:
    """(window_start, window_end, event_type, n, sum_value) tumbling (or
    sliding) window aggregation. Watermark applied only on streaming input."""
    is_streaming = events.isStreaming if streaming is None else streaming
    # event-time watermarks require TIMESTAMP (LTZ); driver parquet carries
    # TIMESTAMP_NTZ — session TZ is pinned UTC so the cast is value-stable
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    src = events.withWatermark("ts", late_threshold) if is_streaming else events
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        src.groupBy(win.alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def stream_events_from_dir(spark, path: str, schema) -> DataFrame:
    """File-source stream over a directory of event parquet files —
    the sandbox stand-in for a Kafka/queue source."""
    return spark.readStream.schema(schema).parquet(path)


def run_available_now(stream_df: DataFrame, query_name: str, checkpoint: str):
    """Drain everything currently available into an in-memory sink and stop —
    deterministic batch-equivalent execution of the streaming plan."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def stream_dedup_exact(
    docs: DataFrame,
    key_cols: tuple[str, ...] = ("text_hash",),
    event_time_col: str = "ts",
    late_threshold: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: keep the first arrival of each key, with
    state bounded by the watermark (``dropDuplicatesWithinWatermark``) —
    the streaming form of the batch ``dedup.dedup_exact``.

    This is the training-pipeline ingest shape: documents arriving as a
    stream are deduped on a content hash without unbounded state — a key
    seen again within the watermark window is dropped; after the watermark
    passes, its state is evicted (re-arrivals later than the lateness bound
    are by definition out of contract). On a static DataFrame this falls
    back to a plain dropDuplicates on the same keys so batch and stream
    stay one logical operator."""
    docs = docs.withColumn(event_time_col, F.col(event_time_col).cast("timestamp"))
    if not docs.isStreaming:
        return docs.dropDuplicates(list(key_cols))
    return docs.withWatermark(event_time_col, late_threshold).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def with_text_hash(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Content hash column for streaming dedup — md5 (engine-portable,
    matching the batch dedup family)."""
    return docs.withColumn("text_hash", F.md5(F.col(text_col).cast("binary")))


def windowed_key_counts(
    events: DataFrame,
    key_col: str = "user_id",
    window: str = "1 hour",
    late_threshold: str = "30 minutes",
    streaming: bool | None = None,
) -> DataFrame:
    """(window_start, key, n) tumbling-window per-key activity counts —
    the streaming-legal half of heavy-hitter detection (one watermarked
    groupBy; state = live windows × keys, bounded by the watermark).
    NULL keys are dropped. Rank downstream with :func:`topk_per_window`
    (a per-window window function is not allowed mid-stream)."""
    is_streaming = events.isStreaming if streaming is None else streaming
    events = events.filter(F.col(key_col).isNotNull()).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    src = events.withWatermark("ts", late_threshold) if is_streaming else events
    return (
        src.groupBy(F.window("ts", window).alias("w"), F.col(key_col).alias("key"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "key", "n")
    )


def topk_per_window(counts: DataFrame, k: int = 5) -> DataFrame:
    """(window_start, key, n, rank) — the k heaviest keys per window from
    a :func:`windowed_key_counts` result (batch readout over the sink).
    Deterministic: ranks on (n DESC, key ASC). The window function
    partitions by window_start — many small sorts, no global sort."""
    from pyspark.sql import Window

    w = Window.partitionBy("window_start").orderBy(
        F.col("n").desc(), F.col("key").asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
