"""Reciprocal-rank fusion of heterogeneous rankers.

RRF (Cormack, Clarke & Buettcher, SIGIR'09): fused(q, i) =
Σ_r 1/(c + rank_r(q, i)) over every ranker r that returned item i for
query q.  The standard ensemble for combining rankers whose SCORES are
incomparable (BM25 vs embedding cosine vs link-structure relatedness) —
only ranks enter, so no calibration is needed, and c=60 damps the
head-heavy contribution of any single list.

Spark shape: union the (query_id, item, rank) lists with no per-list
processing, ONE map-side-combined groupBy on (query_id, item), then a
per-query window bounded by the union of the input top-k lists (k·R
candidates per query, never corpus-scale).  The fused score is
6dp-rounded and tie-broken by item id, so the output order is total and
oracle-replayable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rrf_fuse(
    rankings: list[DataFrame], c: int = 60, topk: int = 10
) -> DataFrame:
    """(query_id, item, n_lists, rrf, rnk) — fuse ``rankings``, each a
    (query_id, item, rank) frame with rank starting at 1."""
    if not rankings:
        raise ValueError("need at least one ranking")
    u = rankings[0].select("query_id", "item", "rank")
    for r in rankings[1:]:
        u = u.unionByName(r.select("query_id", "item", "rank"))
    fused = u.groupBy("query_id", "item").agg(
        F.count(F.lit(1)).alias("n_lists"),
        F.round(F.sum(1.0 / (F.lit(c) + F.col("rank"))), 6).alias("rrf"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf").desc(), F.col("item").asc()
    )
    return (
        fused.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= topk)
        .select("query_id", "item", "n_lists", "rrf", "rnk")
    )
