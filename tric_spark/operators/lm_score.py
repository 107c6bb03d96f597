"""Corpus bigram-LM perplexity scoring — the CCNet-style quality signal.

Wenzek et al. (LREC 2020, "CCNet") rank crawled documents by language-
model perplexity: well-formed text scores low, boilerplate/gibberish high.
The full KenLM is out of scope for a SQL-replayable engine; this is the
same SIGNAL from an add-k-smoothed corpus bigram model (Jurafsky & Martin
ch. 3, the standard construction):

    P(w | v) = (c(v,w) + k) / (c(v) + k·|V|)
    nll(doc) = mean over the doc's bigrams of −ln P(w|v)
    ppl(doc) = exp(nll)

Trained on the scoring corpus itself by default (the in-corpus outlier
detector: documents whose transitions are unlike the corpus score high) or
on an explicit reference corpus (the CCNet setup: score crawl text against
clean-corpus statistics).

Spark shape — zero Python, two bounded shuffles:

    bigrams per doc: arrays_zip of the token array with its own tail —
        expression-level, ONE explode, no positional self-join
    model: groupBy (v,w) count + groupBy v count; |V| folds in as a
        broadcast 1-row aggregate
    score: doc bigrams ⋈ model on (v,w) (left — unseen bigrams get the
        smoothed floor) → one groupBy(doc_id) avg

At 100 TB the (v,w) model table is vocabulary²-bounded in principle but
Zipf-bounded in practice (distinct observed bigrams ≪ corpus tokens); the
score join shuffles on (v,w) with AQE splitting the stopword-pair skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tric_spark.operators.textstats import tokens_col


def _doc_bigrams(docs: DataFrame) -> DataFrame:
    """(doc_id, v, w) — consecutive nonempty-token pairs, one row per
    OCCURRENCE (repetition is signal)."""
    toks = F.filter(tokens_col(), lambda t: t != F.lit(""))
    n = F.size(toks)
    pairs = F.arrays_zip(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))).alias("v"),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))).alias("w"),
    )
    return docs.select("doc_id", F.explode(pairs).alias("bg")).select(
        "doc_id", F.col("bg.v").alias("v"), F.col("bg.w").alias("w")
    )


def lm_perplexity(
    docs: DataFrame,
    train_docs: DataFrame | None = None,
    add_k: float = 0.5,
) -> DataFrame:
    """(doc_id, n_bigrams, avg_nll, ppl) for every document with ≥ 1
    bigram (≥ 2 nonempty tokens — shorter docs have no transitions to
    score). ``train_docs`` defaults to ``docs`` (self-scoring); pass a
    clean reference corpus for the CCNet setup. ``avg_nll`` and ``ppl``
    are 6dp-rounded (ln/exp are not bit-identical across engines)."""
    train = docs if train_docs is None else train_docs
    tb = _doc_bigrams(train)
    bg_counts = tb.groupBy("v", "w").agg(F.count(F.lit(1)).alias("cvw"))
    ctx_counts = tb.groupBy("v").agg(F.count(F.lit(1)).alias("cv"))
    vocab = (
        train.select(
            F.explode(F.filter(tokens_col(), lambda t: t != F.lit(""))).alias("t")
        )
        .agg(F.count_distinct("t").alias("_vsz"))
    )
    sb = (
        _doc_bigrams(docs)
        .join(bg_counts, ["v", "w"], "left")
        .join(ctx_counts, "v", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            (
                -F.log(
                    (F.coalesce("cvw", F.lit(0)) + F.lit(float(add_k)))
                    / (
                        F.coalesce("cv", F.lit(0))
                        + F.lit(float(add_k)) * F.col("_vsz")
                    )
                )
            ).alias("nll"),
        )
    )
    return sb.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg("nll"), 6).alias("avg_nll"),
        F.round(F.exp(F.avg("nll")), 6).alias("ppl"),
    )


def collocations_topk(
    docs: DataFrame,
    k: int = 100,
    min_count: int = 5,
) -> DataFrame:
    """(v, w, n_vw, pmi, rank) — the corpus's top-``k`` collocations by
    pointwise mutual information (Church & Hanks, Comp. Ling. 16(1), 1990):
    pmi = ln(P(v,w) / (P(v)·P(w))) with bigram probability over the bigram
    total and unigram probabilities over the token total. ``min_count``
    drops the hapax noise PMI is notoriously dominated by (the standard
    guard). Ranking uses the 6dp-ROUNDED pmi with (v, w) tie-break.

    100-TB shape: the same one-explode bigram pass as
    :func:`lm_perplexity`; totals fold in as broadcast 1-row aggregates;
    the global top-k is a two-phase partial top-k (per-partition survivors
    → one ≤ k·n_partitions sort), never a full sort of the bigram table."""
    bg = _doc_bigrams(docs)
    cvw = bg.groupBy("v", "w").agg(F.count(F.lit(1)).alias("n_vw")).filter(
        F.col("n_vw") >= min_count
    )
    toks = docs.select(
        F.explode(F.filter(tokens_col(), lambda t: t != F.lit(""))).alias("t")
    )
    c1 = toks.groupBy(F.col("t")).agg(F.count(F.lit(1)).alias("n_t"))
    totals = bg.agg(F.count(F.lit(1)).alias("_bt")).crossJoin(
        toks.agg(F.count(F.lit(1)).alias("_tt"))
    )
    scored = (
        cvw.join(c1.select(F.col("t").alias("v"), F.col("n_t").alias("nv")), "v")
        .join(c1.select(F.col("t").alias("w"), F.col("n_t").alias("nw")), "w")
        .crossJoin(F.broadcast(totals))
        .select(
            "v",
            "w",
            "n_vw",
            F.round(
                F.log(
                    (F.col("n_vw") / F.col("_bt"))
                    / ((F.col("nv") / F.col("_tt")) * (F.col("nw") / F.col("_tt")))
                ),
                6,
            ).alias("pmi"),
        )
    )
    part = Window.partitionBy("_pid").orderBy(
        F.col("pmi").desc(), F.col("v").asc(), F.col("w").asc()
    )
    survivors = (
        scored.withColumn("_pid", F.spark_partition_id())
        .withColumn("_prn", F.row_number().over(part))
        .filter(F.col("_prn") <= k)
        .drop("_pid", "_prn")
    )
    w_all = Window.orderBy(F.col("pmi").desc(), F.col("v").asc(), F.col("w").asc())
    return (
        survivors.withColumn("rank", F.row_number().over(w_all))
        .filter(F.col("rank") <= k)
    )
