"""Streaming DSIR importance gate — train on a reference batch, score the
ingest stream with ZERO state.

The batch estimator (operators/dsir.py::dsir_logweights) is two shuffles;
a stream needs neither: the trained model is ≤ n_buckets rows, so it
collapses to a literal map expression (operators/dsir.py::dsir_model /
dsir_score_expr — the hyperplane-matrix precedent: bounded precompute
shipped as literals). Each micro-batch then scores rows map-only —
no joins, no watermark, no state store — the gate an ingest pipeline
puts at the crawler's mouth, next to streaming/quality.py's Gopher gate
and upstream of the stateful dedup chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tric_spark.operators.dsir import dsir_score_expr


def stream_dsir_scores(
    stream_docs: DataFrame,
    model: tuple[dict[int, float], float, int, int],
    text_col: str = "text",
) -> DataFrame:
    """Input rows + ``logw`` (6dp-rounded mean token log-ratio; NULL text
    → NULL). Append-safe on a stream, identical on a batch frame — the
    unified-contract twin, tested stream==batch."""
    return stream_docs.withColumn(
        "logw", dsir_score_expr(model, text_col=text_col)
    )


def stream_dsir_kept(
    stream_docs: DataFrame,
    model: tuple[dict[int, float], float, int, int],
    min_logw: float,
    text_col: str = "text",
) -> DataFrame:
    """The gated stream: rows whose score clears ``min_logw`` (compared on
    the ROUNDED value — the engine's replayable-cut rule). NULL-text rows
    are dropped (no score, no keep)."""
    scored = stream_dsir_scores(stream_docs, model, text_col=text_col)
    return scored.filter(F.col("logw") >= float(min_logw)).drop("logw")
