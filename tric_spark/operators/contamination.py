"""Benchmark-contamination detection for training corpora: flag training
documents that share a token n-gram with any held-out/benchmark text —
the standard n-gram-overlap decontamination check (GPT-3 appendix C /
PaLM-style 8-gram screens, here with a configurable n).

100-TB shape: the benchmark side is tiny relative to the corpus, so its
distinct gram set is broadcast and the screen is a broadcast inner join
against each training doc's distinct grams — one corpus-side explode, no
shuffle of corpus rows keyed by gram needed when broadcast applies (set
``broadcast_bench=False`` for a benchmark too large to broadcast: same
plan, hash-join shuffle on the gram key instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tric_spark.operators.repetition import positional_ngrams


def contaminated_docs(
    docs: DataFrame,
    bench: DataFrame,
    ngram: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_bench: bool = True,
) -> DataFrame:
    """(doc_id, n_matched_grams) — training docs sharing ≥ 1 token
    ``ngram``-gram with the benchmark set; ``n_matched_grams`` counts the
    doc's DISTINCT grams that hit (both sides deduped, so the count is a
    set-intersection size, stable under repetition on either side).

    Only contaminated docs are returned (the clean majority never leaves
    the join) — anti-join against this frame to decontaminate.
    """
    d = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(positional_ngrams(ngram, text_col))).alias("g"),
    )
    b = (
        bench.select(
            F.explode(F.array_distinct(positional_ngrams(ngram, text_col))).alias("g")
        )
        .distinct()
    )
    if broadcast_bench:
        b = F.broadcast(b)
    return (
        d.join(b, "g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_matched_grams"))
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    ngram: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_bench: bool = True,
) -> DataFrame:
    """``docs`` minus every contaminated document (left-anti on the id)."""
    hits = contaminated_docs(
        docs, bench, ngram=ngram, id_col=id_col, text_col=text_col,
        broadcast_bench=broadcast_bench,
    ).select(id_col)
    return docs.join(hits, id_col, "left_anti")
