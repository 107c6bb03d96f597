"""TextRank keyword extraction (Mihalcea & Tarau, EMNLP'04).
[training-pipeline family: unsupervised corpus keywords — PageRank run
on the word co-occurrence graph instead of the link graph]

Build the undirected word graph (vertices = tokens, edge weight = number
of adjacent co-occurrences across the corpus, window 2 as in the paper),
then rank words with the engine's own weighted PageRank kernel and read
off the top-k. The whole operator is a composition: the bigram pass is
lm_score's, the rank kernel is pagerank.weighted_pagerank — TextRank IS
"PageRank over a different graph", and the engine treats it that way.

Scale shape: one explode + one groupBy builds the graph (vocabulary-
sized, orders of magnitude below the corpus); the PR supersteps inherit
the kernel's chain/checkpoint discipline; top-k is a distributed
TakeOrderedAndProject on the 6dp-ROUNDED rank (rank-on-the-rounded-key,
ties broken by word — the oracle replays the identical order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tric_spark.operators.lm_score import _doc_bigrams
from tric_spark.operators.pagerank import weighted_pagerank


def word_graph(docs: DataFrame) -> DataFrame:
    """(src, dst, weight): canonical undirected word co-occurrence edges —
    adjacent-token pairs (window 2), self-pairs ("the the") dropped,
    weight = total occurrence count of the unordered pair."""
    bg = _doc_bigrams(docs.filter(F.col("text").isNotNull()))
    return (
        bg.filter(F.col("v") != F.col("w"))
        .select(
            F.least("v", "w").alias("src"), F.greatest("v", "w").alias("dst")
        )
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("double").alias("weight"))
    )


def textrank_keywords(
    docs: DataFrame, iters: int = 2, k: int = 20
) -> DataFrame:
    """(word, rank): top-``k`` corpus keywords by ``iters`` fixed weighted
    PageRank iterations over the co-occurrence graph; rank rounded 6dp
    BEFORE the top-k ordering so the total order is replayable."""
    wg = word_graph(docs)
    sym = wg.unionByName(
        wg.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
        )
    )
    verts = sym.select(F.col("src").alias("vid")).distinct()
    r = weighted_pagerank(sym, verts, tol=0.0, max_iter=iters)
    return (
        r.select(F.col("vid").alias("word"), F.round("rank", 6).alias("rank"))
        .orderBy(F.col("rank").desc(), F.col("word").asc())
        .limit(k)
    )
