"""Maximal-marginal-relevance (MMR) diversified top-k retrieval
(Carbonell & Goldstein, SIGIR'98): greedily pick k results maximizing
``lam·rel(c) − (1−lam)·max_sim(c, selected)`` — the de-dup re-ranker run
after ANN retrieval so the k results aren't k near-copies of each other.

Scale shape: relevance pool per query is bounded (``pool``, via the
two-phase partial top-k in similarity.py — no single-task sort), the
pairwise-similarity table is pool² rows per query computed ONCE, and the
k greedy rounds are an unrolled chain of join + per-query window-top-1
stages — k and pool are small constants, so plan depth is fixed and no
per-row Python runs anywhere.

Determinism / oracle parity: relevance and pairwise sims are 6dp-rounded
cosines; each round ranks on the raw ``lam·rel − (1−lam)·msim`` of those
rounded inputs with vec_id tie-break — both engines do the identical IEEE
arithmetic on identical inputs, so the greedy trajectory replays exactly
(the oracle embeds repr(lam)/repr(1−lam) so the literals are
bit-identical too).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tric_spark.operators.similarity import (
    _as_double,
    ann_bruteforce_topk,
    cosine,
)


def mmr_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 3,
    pool: int = 20,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, vec_id, sel_round, score): the k MMR picks per query in
    selection order.  sel_round 1 is the pure-relevance argmax; score is
    the (6dp-rounded) objective value at selection time."""
    cand = (
        ann_bruteforce_topk(embeddings, queries, k=pool, id_col=id_col, vec_col=vec_col)
        .drop("rank")
        .withColumnRenamed("cos", "rel")
    )
    vecs = embeddings.select(
        F.col(id_col).alias("vec_id"), _as_double(vec_col).alias("v")
    )
    cand = cand.join(vecs, "vec_id").select(
        "query_id", "vec_id", "rel", "v"
    ).localCheckpoint(eager=True)
    a = cand.select("query_id", F.col("vec_id").alias("a"), F.col("v").alias("va"))
    b = cand.select("query_id", F.col("vec_id").alias("b"), F.col("v").alias("vb"))
    pairs = (
        a.join(b, "query_id")
        .filter(F.col("a") != F.col("b"))
        .select(
            "query_id",
            "a",
            "b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("sim"),
        )
        .localCheckpoint(eager=True)
    )
    cand = cand.drop("v")

    def top1(scored: DataFrame, rnd: int) -> DataFrame:
        w = Window.partitionBy("query_id").orderBy(
            F.col("raw").desc(), F.col("vec_id").asc()
        )
        return (
            scored.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") == 1)
            .select(
                "query_id",
                "vec_id",
                F.lit(rnd).alias("sel_round"),
                F.round(F.col("raw"), 6).alias("score"),
            )
        )

    selected = top1(cand.withColumn("raw", F.col("rel")), 1)
    for rnd in range(2, k + 1):
        ms = (
            pairs.join(
                selected.select("query_id", F.col("vec_id").alias("b")),
                ["query_id", "b"],
            )
            .groupBy("query_id", F.col("a").alias("vec_id"))
            .agg(F.max("sim").alias("msim"))
        )
        rem = cand.join(
            selected.select("query_id", "vec_id"), ["query_id", "vec_id"], "left_anti"
        )
        scored = rem.join(ms, ["query_id", "vec_id"]).withColumn(
            "raw",
            F.lit(lam) * F.col("rel") - F.lit(1.0 - lam) * F.col("msim"),
        )
        selected = selected.unionAll(top1(scored, rnd))
    return selected
