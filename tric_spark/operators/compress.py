"""Adjacency gap-encoding statistics — the WebGraph compressibility
readout (Boldi & Vigna, WWW'04 "The WebGraph Framework I").
[engine-ops family: storage planning — how many bits/link a
gap-compressed CSR of this graph would take]

Web graphs compress to a few bits per link because consecutive out-
neighbors (sorted by id, with locality-preserving ids) have SMALL gaps.
This operator measures exactly that: per source list sorted by dst, the
first entry costs bitlen(dst+1) and every next one bitlen(dst − prev)
(positive: lists are distinct + sorted), where bitlen(x) = length of the
binary expansion — a pure-integer quantity both engines compute as
length(bin(x)), so the replay is exact with zero float risk.

Not in the reference (tric reads a pre-built binary CSR; this is the
planning diagnostic for WRITING one). The per-γ-code constant offsets of
real WebGraph (γ ≈ 2·bitlen − 1 bits) scale every number by <2×; the
comparative signal — which id assignment / ordering compresses better —
is what the operator is for.

Shape: ONE window pass (partition src, order dst — the partitioning a
CSR writer needs anyway) + one aggregate. No joins, no driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gap_encoding_stats(directed: DataFrame) -> DataFrame:
    """One row (n_links, n_lists, total_bits, bits_per_link) over a
    directed (src, dst) edge table with distinct edges and non-negative
    int ids; ``bits_per_link`` rounded 6dp."""
    w = Window.partitionBy("src").orderBy("dst")
    g = directed.select(
        "src", "dst", F.lag("dst").over(w).alias("_prev")
    )
    bits = F.when(
        F.col("_prev").isNull(), F.length(F.bin(F.col("dst") + 1))
    ).otherwise(F.length(F.bin(F.col("dst") - F.col("_prev"))))
    return g.agg(
        F.count(F.lit(1)).alias("n_links"),
        F.count_distinct("src").alias("n_lists"),
        F.sum(bits).alias("total_bits"),
        F.round(F.sum(bits) / F.count(F.lit(1)), 6).alias("bits_per_link"),
    )
