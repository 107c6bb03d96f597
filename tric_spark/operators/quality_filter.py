"""Gopher-style document quality filtering — the composed keep/drop gate.

Rae et al. 2021 ("Scaling Language Models: ... Gopher", Table A1) define
the de-facto standard rule set for filtering web text before training:
word-count bounds, mean-word-length bounds, a minimum number of distinct
required stopwords, and repetition caps. This module composes the already-
tested primitives (textstats.tokens_col / STOPWORDS,
repetition.repetition_metrics) into one declarative plan that emits every
signal, each rule's verdict, and the final keep flag — a pipeline wants
the per-rule attribution (what did we drop and WHY), not just a boolean.

All signals are JVM built-ins (split/filter/aggregate/array_contains) plus
the repetition metrics' two explode-groupBy passes; zero Python in the
plan. Mean word length is 6dp-rounded before thresholding so the rule
boundary is engine-portable (the crawl-frontier lesson).

100-TB shape: one pass over text for the token stats (expression-level,
no explode), two bounded explode passes for the repetition metrics, two
left joins on doc_id. The filter composes with stratified/weighted
sampling downstream (sampling.py) — filter first, then sample the
survivors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tric_spark.operators.repetition import repetition_metrics
from tric_spark.operators.textstats import STOPWORDS, quality_scores, tokens_col


def gopher_quality_filter(
    docs: DataFrame,
    min_tokens: int = 30,
    max_tokens: int = 100_000,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 12.0,
    min_stop_hits: int = 2,
    max_top2_frac: float = 0.12,
    max_dup3_frac: float = 0.6,
    map_only: bool = False,
    keep_input_cols: bool = False,
) -> DataFrame:
    """(doc_id, n_tokens, mean_word_len, stop_hits, top2_frac, dup3_frac,
    n_failed, keep) — every Gopher-family signal plus per-document rule
    attribution. ``stop_hits`` counts DISTINCT stopwords present (Gopher's
    "contains ≥ 2 of a required-word list"); ``n_failed`` is how many of
    the six rules the document violates; ``keep`` ⇔ n_failed = 0.
    NULL-text documents fail the token rule (0 tokens) by definition.

    ``map_only=True`` computes the repetition signals with the
    expression-level twin (repetition.repetition_metrics_expr) instead of
    the two explode-groupBy passes: identical output, ZERO shuffles and no
    joins — the streaming-safe form (see streaming/quality.py)."""
    toks = F.filter(tokens_col(), lambda t: t != F.lit(""))
    n_tokens = F.size(toks)
    total_chars = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    mean_wl = F.round(
        total_chars.cast("double") / F.greatest(n_tokens, F.lit(1)), 6
    )
    stop_hits = sum(
        (F.array_contains(toks, s).cast("int") for s in STOPWORDS),
        F.lit(0),
    )
    if map_only:
        from tric_spark.operators.repetition import _rep_masses_expr

        ln = F.greatest(F.length("text"), F.lit(1))
        top2 = F.round(_rep_masses_expr(2)["tm"] / ln, 6)
        dup3 = F.round(F.least(F.lit(1.0), _rep_masses_expr(3)["dm"] / ln), 6)
        # keep_input_cols: the streaming-kept shape — every signal is an
        # expression of the row, so the full row can ride along with no
        # join (a stream-stream self-join would otherwise need watermarks)
        lead = [docs["*"]] if keep_input_cols else [F.col("doc_id")]
        joined = docs.select(
            *lead,
            F.coalesce(n_tokens, F.lit(0)).alias("n_tokens"),
            F.coalesce(mean_wl, F.lit(0.0)).alias("mean_word_len"),
            F.coalesce(stop_hits, F.lit(0)).alias("stop_hits"),
            F.coalesce(top2, F.lit(0.0)).alias("top2_frac"),
            F.coalesce(dup3, F.lit(0.0)).alias("dup3_frac"),
        )
    else:
        stats = docs.select(
            "doc_id",
            F.coalesce(n_tokens, F.lit(0)).alias("n_tokens"),
            F.coalesce(mean_wl, F.lit(0.0)).alias("mean_word_len"),
            F.coalesce(stop_hits, F.lit(0)).alias("stop_hits"),
        )
        rep = repetition_metrics(docs)
        joined = stats.join(rep, "doc_id", "left").select(
            "doc_id",
            "n_tokens",
            "mean_word_len",
            "stop_hits",
            F.coalesce("top2_frac", F.lit(0.0)).alias("top2_frac"),
            F.coalesce("dup3_frac", F.lit(0.0)).alias("dup3_frac"),
        )
    fails = (
        (F.col("n_tokens") < min_tokens).cast("int")
        + (F.col("n_tokens") > max_tokens).cast("int")
        + (
            (F.col("mean_word_len") < min_mean_word_len)
            | (F.col("mean_word_len") > max_mean_word_len)
        ).cast("int")
        + (F.col("stop_hits") < min_stop_hits).cast("int")
        + (F.col("top2_frac") > max_top2_frac).cast("int")
        + (F.col("dup3_frac") > max_dup3_frac).cast("int")
    )
    return joined.withColumn("n_failed", fails).withColumn(
        "keep", F.col("n_failed") == 0
    )


def quality_budget_curve(docs: DataFrame, grid: int = 10) -> DataFrame:
    """(threshold, n_docs, n_tokens, frac_tokens) — token budget retained
    when filtering at each quality-score threshold t = 0, 1/grid, …,
    (grid-1)/grid over textstats.quality_scores.

    The curve a pipeline owner reads before choosing a cut: "score ≥ 0.5
    keeps 61% of tokens".  One scan: per-doc scores exploded against the
    constant threshold grid (a grid-size fan-out of a per-DOC frame, then
    a map-side-combined groupBy on `grid` keys — no window, no sort), and
    the corpus total folded in as a broadcast 1-row aggregate.  Threshold
    values are exact decimals via round(i/grid, 6) on both engines."""
    scored = quality_scores(docs.filter(F.col("text").isNotNull())).select(
        "n_tokens", "score"
    )
    th = F.array(*[F.lit(round(i / grid, 6)) for i in range(grid)])
    fan = scored.select(
        "n_tokens", "score", F.explode(th).alias("threshold")
    ).filter(F.col("score") >= F.col("threshold"))
    agg = fan.groupBy("threshold").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
    )
    tot = scored.agg(F.sum("n_tokens").cast("double").alias("tot"))
    return agg.crossJoin(F.broadcast(tot)).select(
        "threshold",
        "n_docs",
        "n_tokens",
        F.round(F.col("n_tokens") / F.col("tot"), 6).alias("frac_tokens"),
    )


def gopher_kept(docs: DataFrame, **thresholds) -> DataFrame:
    """The filtered corpus: ``docs`` rows whose doc passes every rule —
    one semi-join against the keep set; full rows stream through."""
    keep = (
        gopher_quality_filter(docs, **thresholds)
        .filter(F.col("keep"))
        .select("doc_id")
    )
    return docs.join(keep, "doc_id", "left_semi")
