"""Corpus-level segment (passage) deduplication — the MassiveText/C4-style
"remove repeated passages across documents" pass (Rae et al. 2021 §A.1.2;
Raffel et al. 2020 C4 three-sentence-span dedup; Lee et al. 2022
"Deduplicating Training Data Makes Language Models Better" motivates the
substring-granularity variant).

The unit here is a NON-OVERLAPPING ``seg_tokens``-token window of the
whitespace tokenization (the last window of a document may be shorter).
Sentence/line segmentation plugs in by swapping the segment derivation —
the dedup core is granularity-agnostic. Windows rather than sentences keep
every step expressible bit-for-bit in ANSI SQL (split / slice /
array_join), so the driver's DuckDB oracle replays the whole operator.

Policy: the FIRST occurrence in the global (doc_id, seg_idx) order is kept;
every later byte-identical segment is dropped, and each document's kept
segments are re-joined in original order. This is the standard
keep-one-copy passage dedup (C4 drops all-but-one occurrence of any
three-sentence span).

100-TB shape: one explode (corpus token count rows, never doc-pair rows) →
first-occurrence ranking is ONE hash shuffle keyed on the segment text
(Window partitionBy(seg) — each partition is a single segment's occurrence
list, bounded by that segment's corpus frequency) → one groupBy(doc_id) to
reassemble. For adversarial corpora where one segment occurs millions of
times (boilerplate), the per-segment partition holds (occurrence) rows of
(doc_id, seg_idx) only — no text duplication beyond the key itself; salt is
unnecessary because the window computes nothing but row_number.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from tric_spark.operators.textstats import tokens_col


def segments_col(seg_tokens: int, text: str | Column = "text") -> Column:
    """All non-overlapping ``seg_tokens``-token windows of ``text`` in
    position order (array<string>; the final window keeps the tail even if
    shorter). An empty text tokenizes to [""] (split semantics shared by
    Spark and DuckDB) and yields one empty segment — preserved, so the
    round trip ``dedup`` of a corpus without duplicates is the identity."""
    toks = tokens_col(text)
    n_seg = F.ceil(F.size(toks) / F.lit(float(seg_tokens))).cast("int")
    return F.transform(
        F.sequence(F.lit(1), F.greatest(n_seg, F.lit(1))),
        lambda j: F.array_join(
            F.slice(toks, (j - F.lit(1)) * seg_tokens + 1, seg_tokens), " "
        ),
    )


def doc_segments(
    docs: DataFrame, seg_tokens: int = 8, id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, seg_idx, seg) — the corpus exploded into position-indexed
    segments (seg_idx is 0-based)."""
    return docs.select(
        F.col(id_col),
        F.posexplode(segments_col(seg_tokens, text_col)).alias("seg_idx", "seg"),
    )


def _ranked(segs: DataFrame, id_col: str) -> DataFrame:
    w = Window.partitionBy("seg").orderBy(F.col(id_col).asc(), F.col("seg_idx").asc())
    return segs.withColumn("rn", F.row_number().over(w))


def duplicated_segments(
    docs: DataFrame, seg_tokens: int = 8, id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, seg_idx, seg, first_id, first_seg_idx) — every non-first
    occurrence of a corpus-duplicated segment, with the occurrence it
    duplicates (the audit view: what WOULD be dropped and why)."""
    segs = doc_segments(docs, seg_tokens, id_col, text_col)
    w = Window.partitionBy("seg").orderBy(F.col(id_col).asc(), F.col("seg_idx").asc())
    first = Window.partitionBy("seg")
    return (
        segs.withColumn("rn", F.row_number().over(w))
        .withColumn("first_id", F.min(F.struct(id_col, "seg_idx")).over(first))
        .filter(F.col("rn") > 1)
        .select(
            id_col,
            "seg_idx",
            "seg",
            F.col(f"first_id.{id_col}").alias("first_id"),
            F.col("first_id.seg_idx").alias("first_seg_idx"),
        )
    )


def dedup_segments(
    docs: DataFrame, seg_tokens: int = 8, id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, text_clean, n_segs, n_kept) — the corpus with every non-first
    occurrence of each segment removed and documents reassembled from their
    surviving segments in original order. A document whose every segment
    was seen earlier collapses to text_clean = '' (it still appears — the
    doc spine is preserved, C4-style accounting needs the empty rows)."""
    kept = (
        _ranked(doc_segments(docs, seg_tokens, id_col, text_col), id_col)
        .withColumn("keep", F.col("rn") == 1)
    )
    return (
        kept.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("keep"), F.struct("seg_idx", "seg"))
                        )
                    ),
                    lambda s: s["seg"],
                ),
                " ",
            ).alias("text_clean"),
            F.count(F.lit(1)).alias("n_segs"),
            F.sum(F.col("keep").cast("long")).alias("n_kept"),
        )
    )
