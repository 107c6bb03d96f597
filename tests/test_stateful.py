import datetime as dt

from pyspark.sql import functions as F

from tric_spark.sources.tables import load_table
from tric_spark.streaming.stateful import sessionize_batch, sessionize_stream

SF = "/root/testdata/sf0.001"
GAP_MIN = 30


def test_stream_sessions_match_batch(spark, tmp_path):
    events = (
        load_table(spark, SF, "events")
        .filter(F.col("user_id") < 30)
        .select("user_id", F.col("ts").cast("timestamp").alias("ts"), "value")
    )
    split = events.selectExpr(
        "percentile(unix_timestamp(ts), 0.8) as p"
    ).collect()[0]["p"]
    src = str(tmp_path / "src")
    events.filter(F.unix_timestamp("ts") <= split).coalesce(1).write.parquet(
        src + "/f1"
    )
    events.filter(F.unix_timestamp("ts") > split).coalesce(1).write.parquet(
        src + "/f2"
    )

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    q = (
        sessionize_stream(stream, gap_minutes=GAP_MIN)
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.session_start, r.session_end): (r.n_events, r.sum_value)
        for r in spark.sql("select * from sessions").collect()
    }
    q.stop()

    # batch oracle: only sessions the stream could CLOSE (watermark = global
    # max ts; open sessions within one gap of it stay in state)
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    horizon = max_ts - dt.timedelta(minutes=GAP_MIN)
    want = {
        (r.user_id, r.session_start, r.session_end): (r.n_events, r.sum_value)
        for r in sessionize_batch(events, gap_minutes=GAP_MIN).collect()
        if r.session_end <= horizon
    }
    assert len(want) > 20
    assert got == want


def test_batch_sessionize_gap_semantics(spark):
    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0), 1.0),
        (1, dt.datetime(2024, 1, 1, 0, 10), 2.0),
        (1, dt.datetime(2024, 1, 1, 1, 0), 4.0),  # > 30 min gap → new session
        (2, dt.datetime(2024, 1, 1, 0, 5), 8.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {
        (r.user_id, r.session_start.minute, r.n_events, r.sum_value)
        for r in sessionize_batch(df, gap_minutes=30).collect()
    }
    assert got == {(1, 0, 2, 3.0), (1, 0, 1, 4.0), (2, 5, 1, 8.0)}


def test_batch_gap_is_microsecond_exact(spark):
    """ADVICE r1: sub-second timestamps near the gap boundary must classify
    identically in batch and stream. True gap 1799.2s (< 30 min) is one
    session; whole-second truncation would call it 1800 and split it."""
    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0, 0, 900000), 1.0),
        (1, dt.datetime(2024, 1, 1, 0, 30, 0, 100000), 2.0),  # gap 1799.2s
        (2, dt.datetime(2024, 1, 1, 0, 0, 0, 100000), 1.0),
        (2, dt.datetime(2024, 1, 1, 0, 30, 0, 100000), 2.0),  # gap 1800.0s
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {
        (r.user_id, r.n_events) for r in sessionize_batch(ev, gap_minutes=30).collect()
    }
    assert got == {(1, 2), (2, 1)}, got  # u1 one session of 2; u2 two sessions
