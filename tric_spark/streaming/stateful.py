"""Custom stateful streaming operator: event sessionization per user.

Demonstrates the ``applyInPandasWithState`` surface — arbitrary per-key
state kept by the engine's state store, updated from Arrow-batched pandas
groups (never per-row Python). Sessions close when a gap of
``gap_minutes`` passes with no event (event-time, driven by the watermark).

Semantics: a session = maximal run of a user's events where consecutive
events are < gap apart. Emits one row per CLOSED session:
(user_id, session_start, session_end, n_events, sum_value). On the static
batch side :func:`sessionize_batch` computes the same thing with window
functions — the tests assert stream == batch on identical input (closed
sessions only).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, sum_value double"
)
STATE_SCHEMA = "start long, last long, n long, sv double"


def _sessionize_events(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    gap_us: int,
) -> Iterator[pd.DataFrame]:
    rows = pd.concat(list(pdfs)) if pdfs else pd.DataFrame()
    closed = []
    if state.exists:
        start, last, n, sv = state.get
    else:
        start = last = None
        n, sv = 0, 0.0
    if not rows.empty:
        ts = rows["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        vals = rows["value"].to_numpy()
        order = ts.argsort(kind="stable")
        for t, v in zip(ts[order], vals[order]):
            if start is None:
                start, last, n, sv = int(t), int(t), 1, float(v)
            elif t - last < gap_us:
                last, n, sv = int(t), n + 1, sv + float(v)
            else:
                closed.append((start, last, n, sv))
                start, last, n, sv = int(t), int(t), 1, float(v)
    if state.hasTimedOut:
        if start is not None:
            closed.append((start, last, n, sv))
        state.remove()
    else:
        state.update((start, last, n, sv))
        # close the open session once the watermark passes last+gap
        state.setTimeoutTimestamp(last // 1000 + gap_us // 1000)
    if closed:
        out = pd.DataFrame(closed, columns=["start", "last", "n", "sv"])
        yield pd.DataFrame(
            {
                "user_id": key[0],
                "session_start": pd.to_datetime(out["start"], unit="us"),
                "session_end": pd.to_datetime(out["last"], unit="us"),
                "n_events": out["n"],
                "sum_value": out["sv"].round(4),
            }
        )


def sessionize_stream(
    events: DataFrame, gap_minutes: int = 30, late_threshold: str = "0 seconds"
) -> DataFrame:
    """Streaming sessionization with engine-managed per-user state."""
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key, pdfs, state):
        return _sessionize_events(key, pdfs, state, gap_us)

    src = events.withColumn("ts", F.col("ts").cast("timestamp")).withWatermark(
        "ts", late_threshold
    )
    return src.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def sessionize_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Same sessionization on a static DataFrame via window functions —
    the oracle for the streaming path (and a useful batch op itself)."""
    gap_s = gap_minutes * 60
    w = Window.partitionBy("user_id").orderBy("ts")
    ts = F.col("ts").cast("timestamp")
    marked = (
        events.withColumn("ts", ts)
        .withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "new_session",
            (
                F.col("prev_ts").isNull()
                # microsecond epochs, NOT unix_timestamp (whole-second
                # truncation): the streaming kernel compares microsecond
                # epochs, and sub-second gaps at the boundary must classify
                # identically or the stream==batch contract breaks
                | (F.unix_micros("ts") - F.unix_micros("prev_ts") >= gap_s * 1_000_000)
            ).cast("int"),
        )
        .withColumn("session_id", F.sum("new_session").over(w))
    )
    return marked.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    ).drop("session_id")
