"""Streaming Gopher quality gate — map-only, stateless, append-mode.

The batch gate (operators/quality_filter.py) joins a two-shuffle
repetition pass; a stream can't do that without state it doesn't need —
every signal is a pure function of ONE document. This wrapper runs the
gate with ``map_only=True`` (token stats + the expression-level repetition
twin, repetition._rep_masses_expr): zero shuffles, zero state, zero
watermarks — each micro-batch filters rows as they arrive, the shape an
ingest pipeline wants (gate at the crawler's mouth, before anything is
stored or shuffled).

Composes upstream of the stateful streaming dedup chain
(windows.stream_dedup_exact → neardup.stream_neardup_candidates): gate
first — dropped docs never enter dedup state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from tric_spark.operators.quality_filter import gopher_quality_filter


def stream_gopher_signals(stream_docs: DataFrame, **thresholds) -> DataFrame:
    """Per-document signals + keep flag on a streaming frame (same schema
    as the batch gate; append-safe)."""
    return gopher_quality_filter(stream_docs, map_only=True, **thresholds)


_SIGNAL_COLS = (
    "n_tokens", "mean_word_len", "stop_hits", "top2_frac", "dup3_frac",
    "n_failed", "keep",
)


def stream_gopher_kept(stream_docs: DataFrame, **thresholds) -> DataFrame:
    """The gated stream: full input rows whose document passes every rule.
    The keep decision rides the row as expressions (keep_input_cols) and is
    filtered then dropped — NO join anywhere, so no watermark is needed."""
    flags = gopher_quality_filter(
        stream_docs, map_only=True, keep_input_cols=True, **thresholds
    )
    return flags.filter(flags["keep"]).drop(*_SIGNAL_COLS)
