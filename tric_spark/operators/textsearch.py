"""Inverted index, positional phrase search, BM25 ranking — the IR
surface of the engine. [pipeline family: a link-graph/webtext engine's
query side — build the index distributed, score with the standard
probabilistic ranking function]

- :func:`inverted_index` — positional postings, the classic
  (token → [(doc, positions)]) structure as a DataFrame: one posexplode +
  one map-side-combined groupBy. At 100 TB the postings table shuffles
  once on (token, doc_id) and is naturally skew-split by AQE (stopword
  tokens are the hot keys); it lands bucketed-by-token for the query side.
- :func:`phrase_counts` — exact positional phrase matching by joining
  consecutive terms' postings per doc and intersecting shifted position
  arrays (the standard positional-index algorithm, Manning/Raghavan/
  Schütze IIR §2.4.2). Each join is keyed on doc_id over ONLY the
  phrase terms' postings — never the corpus.
- :func:`bm25_scores` / :func:`bm25_topk` — Okapi BM25 (Robertson &
  Zaragoza, FnTIR 3(4), 2009) with the Lucene +1 idf floor so scores stay
  positive. Query terms are a literal list: the tf pass filters the
  explode to them (predicate on the scan), df/avgdl are tiny broadcast
  aggregates, and the top-k cut is TakeOrderedAndProject on the ROUNDED
  score (the engine's replayable-cut rule).

Reference analog: none (tric is a TC engine); cites stay to the shared
tokenization (operators/textstats.py::tokens_col).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tric_spark.operators.textstats import tokens_col


def _doc_tokens_pos(docs: DataFrame) -> DataFrame:
    """(doc_id, pos, token) — 1-based positions over nonempty tokens."""
    toks = F.filter(tokens_col(), lambda t: t != F.lit(""))
    return docs.filter(F.col("text").isNotNull()).select(
        "doc_id", F.posexplode(toks).alias("pos0", "token")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "token")


def inverted_index(docs: DataFrame) -> DataFrame:
    """(token, doc_id, tf, positions) — positional postings, positions
    sorted ascending within each (token, doc)."""
    return (
        _doc_tokens_pos(docs)
        .groupBy("token", "doc_id")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.array_sort(F.collect_list("pos")).alias("positions"),
        )
    )


def postings_stats(docs: DataFrame) -> DataFrame:
    """(token, df, tf) — document frequency and total term frequency per
    token; the dictionary head of the index."""
    return (
        _doc_tokens_pos(docs)
        .groupBy("token")
        .agg(
            F.count_distinct("doc_id").alias("df"),
            F.count(F.lit(1)).alias("tf"),
        )
    )


def phrase_counts(docs: DataFrame, phrase: list[str]) -> DataFrame:
    """(doc_id, n_matches) — exact occurrence count of the token phrase,
    docs with ≥ 1 match only. Joins are per-term postings keyed on doc_id;
    position arrays shift-and-intersect left to right."""
    if not phrase:
        raise ValueError("phrase must have at least one term")
    idx = inverted_index(docs).select("token", "doc_id", "positions")
    cur = (
        idx.filter(F.col("token") == phrase[0])
        .select("doc_id", F.col("positions").alias("cur"))
    )
    for term in phrase[1:]:
        nxt = idx.filter(F.col("token") == term).select(
            "doc_id", F.col("positions").alias("nxt")
        )
        cur = (
            cur.join(nxt, "doc_id")
            .select(
                "doc_id",
                F.array_intersect(
                    F.transform("cur", lambda p: p + 1), F.col("nxt")
                ).alias("cur"),
            )
            .filter(F.size("cur") > 0)
        )
    return cur.select("doc_id", F.size("cur").alias("n_matches"))


def bm25_scores(
    docs: DataFrame,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(doc_id, score) for every doc matching ≥ 1 query term.

    idf = ln(1 + (N − df + 0.5)/(df + 0.5)) (the Lucene floor — never
    negative, stopword-safe); score rounded 6dp."""
    if not terms:
        raise ValueError("terms must be nonempty")
    tp = _doc_tokens_pos(docs)
    dl = tp.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    qt = tp.filter(F.col("token").isin(list(terms)))
    tf = qt.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df = qt.groupBy("token").agg(F.count_distinct("doc_id").alias("df"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    scored = (
        tf.join(F.broadcast(df), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            (
                F.log(
                    1.0
                    + (F.col("n_docs") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (k1 + 1))
                / (
                    F.col("tf")
                    + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("s"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.round(F.sum("s"), 6).alias("score")
    )


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(doc_id, score, rank) — top-k by rounded BM25, doc_id tiebreak;
    the k-cut is TakeOrderedAndProject, the rank window runs over k rows."""
    from pyspark.sql import Window

    scores = bm25_scores(docs, terms, k1=k1, b=b)
    topk = scores.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return topk.withColumn("rank", F.row_number().over(w))
