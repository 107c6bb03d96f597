"""Streaming graph maintenance: connected-component labels kept current
over a STREAM of edge insertions. [north-rule family: the streaming twin
of operators/cc.py, powered by cc_incremental]

Structured Streaming has no native iterative-graph operator, so the
maintainer runs as a ``foreachBatch`` sink: each micro-batch of new
(src, dst) edges is folded into the label state with
``cc_incremental`` — per batch that is one CC run over the batch-sized
LABEL GRAPH plus one remap join of the full state, never a recompute
over the accumulated edge set (the whole point at crawl scale: the
edge stream is unbounded, the state is one row per vertex).

The state DataFrame is `checkpoint_cut` per batch: it both feeds and
receives joins every batch, so lineage AND origin-stats must be cut
(CLAUDE.md rule). Labels keep the min-vid invariant batch over batch
(cc_incremental preserves it), so at any prefix of the stream the state
equals a from-scratch batch labeling of the edges seen so far — the
test asserts exactly that. Edge deletions are out of scope (splits need
recompute — see cc_incremental's docstring).

For exactly-once production use, pair with a durable sink for the
labels per batch; batch_id is exposed to make that idempotent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tric_spark.operators.cc import cc_incremental
from tric_spark.plans.lineage import checkpoint_cut


class CCMaintainer:
    """``foreachBatch`` callable that folds each micro-batch of edges
    into a (vid, comp) label state. Read ``labels`` between/after
    batches; ``n_batches`` counts folds (idempotence hooks)."""

    def __init__(self, spark):
        self.labels: DataFrame = spark.createDataFrame(
            [], "vid long, comp long"
        )
        self.n_batches = 0

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        new = batch_df.select("src", "dst").filter(
            F.col("src") != F.col("dst")
        )
        self.labels = checkpoint_cut(cc_incremental(self.labels, new))
        self.n_batches += 1


def stream_cc(edge_stream: DataFrame, maintainer: CCMaintainer):
    """Attach ``maintainer`` to a streaming (src, dst) DataFrame; returns
    the unstarted writeStream (caller picks trigger/checkpoint)."""
    return edge_stream.writeStream.foreachBatch(maintainer)
