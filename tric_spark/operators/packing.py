"""Sequence packing — the pretraining-batch assembly step of an LLM data
pipeline: documents are tokenized, laid out on one contiguous token stream
per group (host/shard), and cut into fixed-capacity training sequences.
This is GPT-style concat-and-split packing (documents may span sequence
boundaries); the emitted (start offset, first bin, last bin) per document
is exactly the index a training loader consumes.

Not in the reference (tric counts triangles only) — engine breadth for the
training-data-pipeline tier, same charter as dedup/textstats.

Determinism & oracle portability: the stream order within a group is
(md5(doc_id), doc_id) — a seedless deterministic shuffle that decorrelates
document length from stream position (md5 replays verbatim in DuckDB, and
the doc_id tie-break makes the order total). Token counts are the
whitespace convention the textstats family shares (split on a single
space), so the same document counts identically everywhere.

Scale shape: ONE window per group computes the running offset — the window
is partitioned by the group column, so a 100-TB corpus packs as thousands
of independent per-host streams, never one global sort. Everything is
JVM built-ins (split/size/window cumsum); no UDFs, no collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    docs: DataFrame,
    capacity: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """(doc_id, grp, n_tokens, start_off, bin_start, bin_end) — lay each
    group's documents on a token stream in (md5(id), id) order and cut it
    into ``capacity``-token bins. A document occupies stream interval
    [start_off, start_off + n_tokens); bin_start/bin_end are the first and
    last bins it touches (equal when it fits inside one training sequence,
    spanning otherwise — concat-and-split semantics).

    NULL-text documents are filtered up front (the library-wide rule: a
    NULL never silently forms a class/position of its own).
    """
    if capacity < 1:
        raise ValueError("capacity must be >= 1")
    base = (
        docs.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("doc_id"),
            F.col(group_col).alias("grp"),
            F.size(F.split(F.col(text_col), " ")).alias("n_tokens"),
            F.md5(F.col(id_col).cast("string").cast("binary")).alias("h"),
        )
    )
    w = (
        Window.partitionBy("grp")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return base.select(
        "doc_id",
        "grp",
        "n_tokens",
        (cum - F.col("n_tokens")).alias("start_off"),
        F.floor((cum - F.col("n_tokens")) / capacity).alias("bin_start"),
        F.floor((cum - 1) / capacity).alias("bin_end"),
    )


def packing_stats(packed: DataFrame, capacity: int) -> DataFrame:
    """(grp, n_docs, n_tokens, n_bins, fill_ratio) per group — the packing
    efficiency readout: fill_ratio = tokens / (bins · capacity). The last
    (partial) bin is the only slack under concat-and-split, so fill_ratio
    → 1 as streams grow; a loader-side drop-last policy makes it exact.
    One partial-aggregated groupBy."""
    return (
        packed.groupBy("grp")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            (F.max("bin_end") + 1).alias("n_bins"),
        )
        .select(
            "grp",
            "n_docs",
            "n_tokens",
            "n_bins",
            F.round(
                F.col("n_tokens") / (F.col("n_bins") * F.lit(capacity)), 6
            ).alias("fill_ratio"),
        )
    )
