"""Intra-document repetition metrics — the Gopher-style quality signals
(Rae et al. 2021, "Scaling Language Models", Table A1) used to filter
boilerplate / spam from web-scale training corpora:

- ``top_ngram_char_frac``: fraction of the document's characters covered
  by its single most frequent word n-gram (count × gram length ÷ doc
  length; ties broken by lexicographically smallest gram).
- ``dup_ngram_char_frac``: fraction covered by ALL n-grams occurring more
  than once (Σ count × gram length ÷ doc length, capped at 1.0 — the
  occurrence-mass approximation of char coverage, overlaps counted).

Both definitions are deliberately exact and portable: the DuckDB oracle
(__spark_entry__.oracle_sql) replays every step bit-for-bit.

100-TB shape: positional n-grams are exploded once per metric length and
counted with a map-side-combined groupBy keyed on (doc_id, gram) — the
key cardinality is bounded by corpus token count, never by doc pairs, and
the per-doc top-1 window partitions on doc_id (each partition ≤ the
document's distinct-gram count). No Python in the plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from tric_spark.operators.textstats import tokens_col


def positional_ngrams(n: int, text: str | Column = "text") -> Column:
    """ALL word n-grams of ``text`` in position order (duplicates kept —
    repetition is the signal here, unlike dedup.shingles_col's distinct
    sets). Documents shorter than ``n`` tokens have no n-grams: an
    explicit empty array, because Spark's sequence(1, k) is DESCENDING for
    k < 1 and would fabricate grams."""
    toks = tokens_col(text)
    cnt = F.size(toks)
    return F.when(cnt < n, F.expr("array()").cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), cnt - n + 1),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        )
    )


def _gram_stats(docs: DataFrame, n: int, id_col: str) -> DataFrame:
    """(id, top_mass_{n}, dup_mass_{n}) — char mass of the most frequent
    n-gram and of all duplicated n-grams."""
    counts = (
        docs.select(F.col(id_col), F.explode(positional_ngrams(n)).alias("g"))
        .groupBy(id_col, "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("c").desc(), F.col("g").asc())
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .groupBy(id_col)
        .agg(
            F.sum(
                F.when(F.col("rn") == 1, F.col("c") * F.length("g")).otherwise(0)
            ).alias(f"top_mass_{n}"),
            F.sum(
                F.when(F.col("c") >= 2, F.col("c") * F.length("g")).otherwise(0)
            ).alias(f"dup_mass_{n}"),
        )
    )


def repetition_metrics(
    docs: DataFrame, top_n: int = 2, dup_n: int = 3, id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, top{top_n}_frac, dup{dup_n}_frac) — rounded 6dp, 0.0 for
    documents too short to have any n-gram (they cannot repeat one).

    The two metric lengths ride separate explode→count passes (different
    gram keys cannot share a shuffle), then left-join back onto the doc
    spine so every input document appears exactly once."""
    top = _gram_stats(docs, top_n, id_col).select(
        id_col, F.col(f"top_mass_{top_n}").alias("tm")
    )
    dup = _gram_stats(docs, dup_n, id_col).select(
        id_col, F.col(f"dup_mass_{dup_n}").alias("dm")
    )
    spine = docs.select(id_col, F.length("text").alias("len"))
    return (
        spine.join(top, id_col, "left")
        .join(dup, id_col, "left")
        .select(
            id_col,
            F.round(
                F.coalesce(F.col("tm"), F.lit(0)) / F.greatest("len", F.lit(1)), 6
            ).alias(f"top{top_n}_frac"),
            F.round(
                F.least(
                    F.lit(1.0),
                    F.coalesce(F.col("dm"), F.lit(0)) / F.greatest("len", F.lit(1)),
                ),
                6,
            ).alias(f"dup{dup_n}_frac"),
        )
    )


def _rep_masses_expr(n: int, text: str | Column = "text") -> Column:
    """struct(tm, dm) — the per-document gram masses as ONE expression
    (no explode, no shuffle): a single F.aggregate scan over the SORTED
    positional grams with a struct accumulator tracking the current run,
    the duplicate mass of finished runs, and the best (count, gram) seen.
    Tie rule matches _gram_stats' window exactly: the best gram replaces
    only on a STRICTLY longer run, and the traversal is ascending, so
    among equal counts the lexicographically smallest gram wins.

    This is the map-only twin of the explode-groupBy batch plan — the form
    a STREAMING quality gate needs (stateless, per-row): the batch plan
    shuffles once per metric for cluster-wide partial aggregation, this
    one trades that for O(|doc| log |doc|) in-row work."""
    grams = F.array_sort(positional_ngrams(n, text))
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("dup"),
        F.lit(0).cast("long").alias("brun"),
        F.lit(None).cast("string").alias("bgram"),
    )

    def step(acc: Column, g: Column) -> Column:
        same = acc["prev"].isNotNull() & (g == acc["prev"])
        run2 = F.when(same, acc["run"] + 1).otherwise(F.lit(1).cast("long"))
        dup2 = F.when(
            (~same) & (acc["run"] >= 2),
            acc["dup"] + acc["run"] * F.length(acc["prev"]),
        ).otherwise(acc["dup"])
        better = run2 > acc["brun"]
        return F.struct(
            g.alias("prev"),
            run2.alias("run"),
            dup2.alias("dup"),
            F.when(better, run2).otherwise(acc["brun"]).alias("brun"),
            F.when(better, g).otherwise(acc["bgram"]).alias("bgram"),
        )

    def finish(acc: Column) -> Column:
        dupf = F.when(
            acc["run"] >= 2, acc["dup"] + acc["run"] * F.length(acc["prev"])
        ).otherwise(acc["dup"])
        top = F.when(
            acc["bgram"].isNotNull(), acc["brun"] * F.length(acc["bgram"])
        ).otherwise(F.lit(0).cast("long"))
        return F.struct(top.alias("tm"), dupf.alias("dm"))

    return F.aggregate(grams, init, step, finish)


def repetition_metrics_expr(
    docs: DataFrame, top_n: int = 2, dup_n: int = 3, id_col: str = "doc_id"
) -> DataFrame:
    """Map-only twin of :func:`repetition_metrics` — identical output
    (asserted by test), zero shuffles, streaming-safe (pure per-row
    expressions, no state). Use on streams or when the per-doc in-row
    O(|doc| log |doc|) beats two cluster shuffles."""
    top = _rep_masses_expr(top_n)["tm"]
    dup = _rep_masses_expr(dup_n)["dm"]
    ln = F.greatest(F.length("text"), F.lit(1))
    return docs.select(
        id_col,
        F.round(top / ln, 6).alias(f"top{top_n}_frac"),
        F.round(F.least(F.lit(1.0), dup / ln), 6).alias(f"dup{dup_n}_frac"),
    )
