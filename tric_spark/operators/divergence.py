"""Distribution-shift detection: Jensen–Shannon divergence between the
token distributions of corpus strata (language, host, crawl snapshot…).

The drift monitor of a training-data pipeline: JS(P‖Q) ∈ [0, ln 2] is
symmetric, bounded, and defined even where supports differ — no smoothing
constant to pick (unlike KL).  A rising JS between this week's crawl and
the reference corpus is the "your data changed" alarm.

The zero-mass terms are folded in CLOSED FORM instead of an outer join:
for a token only in P, its JS term is p·ln(p/(p/2)) = p·ln 2, so the sum
over P-only tokens is ln 2 · (1 − Σ_shared p).  That turns the whole
computation into one inner join on shared tokens + per-pair aggregates —
at web scale the shared-vocabulary join is vocab-sized, and the pair
matrix is |strata|² (tiny), cross-joined from a broadcast key list so
fully disjoint strata still report JS = ln 2.

All expressions are JVM built-ins with natural log on both engines
(DuckDB log() is base-10 — engine lore); outputs 6dp-rounded.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tric_spark.operators.textstats import tokens_col


def token_distributions(docs: DataFrame, key_col: str = "lang") -> DataFrame:
    """(key, token, p) — per-stratum unigram probabilities."""
    toks = (
        docs.filter(F.col("text").isNotNull() & F.col(key_col).isNotNull())
        .select(
            F.col(key_col).alias("key"),
            F.explode(F.filter(tokens_col(), lambda t: t != F.lit(""))).alias(
                "token"
            ),
        )
        .groupBy("key", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = toks.groupBy("key").agg(F.sum("c").alias("t"))
    return toks.join(F.broadcast(tot), "key").select(
        "key", "token", (F.col("c") / F.col("t")).alias("p")
    )


def js_divergence_by(docs: DataFrame, key_col: str = "lang") -> DataFrame:
    """(key_a, key_b, n_shared, js) — pairwise Jensen–Shannon divergence
    (nats) between every ordered pair key_a < key_b of strata."""
    dist = token_distributions(docs, key_col).localCheckpoint(eager=True)
    a = dist.select(
        F.col("key").alias("key_a"), "token", F.col("p").alias("pa")
    )
    b = dist.select(
        F.col("key").alias("key_b"), "token", F.col("p").alias("pb")
    )
    m = (F.col("pa") + F.col("pb")) / 2
    shared = (
        a.join(b, "token")
        .filter(F.col("key_a") < F.col("key_b"))
        .groupBy("key_a", "key_b")
        .agg(
            F.count(F.lit(1)).alias("n_shared"),
            F.sum(F.col("pa") * F.log(F.col("pa") / m)).alias("ta"),
            F.sum(F.col("pb") * F.log(F.col("pb") / m)).alias("tb"),
            F.sum("pa").alias("spa"),
            F.sum("pb").alias("spb"),
        )
    )
    keys = dist.select("key").distinct()
    pairs = (
        keys.select(F.col("key").alias("key_a"))
        .crossJoin(F.broadcast(keys.select(F.col("key").alias("key_b"))))
        .filter(F.col("key_a") < F.col("key_b"))
    )
    ln2 = F.lit(math.log(2.0))
    full = pairs.join(shared, ["key_a", "key_b"], "left").fillna(
        0, subset=["n_shared", "ta", "tb", "spa", "spb"]
    )
    js = 0.5 * (F.col("ta") + (1 - F.col("spa")) * ln2) + 0.5 * (
        F.col("tb") + (1 - F.col("spb")) * ln2
    )
    return full.select(
        "key_a", "key_b", "n_shared", F.round(js, 6).alias("js")
    )
