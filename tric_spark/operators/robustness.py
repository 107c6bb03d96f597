"""Targeted-attack robustness: how fast does the giant component shatter
as the highest-degree hubs are removed (Albert, Jeong & Barabási, Nature
406, 2000 — scale-free nets are attack-fragile, failure-tolerant)?

For each fraction f the removal set is "every vertex whose degree
EXCEEDS the (1−f) degree quantile" (cum-rank >= ceil((1−f)·n) rule, the
same percentile_disc convention as textstats.exact_quantiles).  A
quantile THRESHOLD — not a top-⌈f·n⌉ rank cut — keeps the operator free
of any global sort and makes the removal set deterministic under ties
(all vertices of a tied degree stay or go together; n_removed reports
the realized count).

Per fraction: one broadcast threshold, two semi-joins to drop touching
edges, one hash-min CC run, three scalar readouts.  The fractions list
is a small constant, so the whole curve is a fixed chain of bounded
stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def attack_robustness(
    sym_edges: DataFrame,
    degrees: DataFrame,
    fractions: tuple[float, ...] = (0.0, 0.01, 0.05, 0.10),
) -> DataFrame:
    """(frac, d_threshold, n_removed, n_remaining, giant_size,
    giant_frac) — one row per attack fraction."""
    from tric_spark.operators.cc import connected_components

    spark = sym_edges.sparkSession
    n = degrees.count()
    counts = degrees.groupBy("degree").agg(F.count(F.lit(1)).alias("c"))
    w = Window.orderBy("degree").rowsBetween(Window.unboundedPreceding, 0)
    cum = counts.select(
        "degree", F.sum("c").over(w).alias("cum")
    ).localCheckpoint(eager=True)
    rows = []
    for f in fractions:
        d = (
            cum.filter(F.col("cum") >= F.ceil(F.lit(1.0 - f) * F.lit(n)))
            .agg(F.min("degree").alias("d"))
            .first()[0]
        )
        kept = degrees.filter(F.col("degree") <= d).select("vid")
        kept_sym = sym_edges.join(
            kept.withColumnRenamed("vid", "src"), "src", "left_semi"
        ).join(kept.withColumnRenamed("vid", "dst"), "dst", "left_semi")
        comp = connected_components(kept_sym, kept)
        giant = (
            comp.groupBy("comp")
            .agg(F.count(F.lit(1)).alias("s"))
            .agg(F.max("s").alias("g"))
            .first()[0]
            or 0
        )
        n_rem = n - kept.count()
        rows.append(
            (
                float(f),
                int(d),
                int(n_rem),
                int(n - n_rem),
                int(giant),
                round(giant / (n - n_rem), 6) if n > n_rem else None,
            )
        )
    return spark.createDataFrame(
        rows,
        "frac double, d_threshold long, n_removed long, n_remaining long,"
        " giant_size long, giant_frac double",
    )


def random_failure_robustness(
    sym_edges: DataFrame,
    degrees: DataFrame,
    fractions: tuple[float, ...] = (0.0, 0.10, 0.30),
    seed: int = 7,
) -> DataFrame:
    """(frac, n_removed, n_remaining, giant_size, giant_frac) — the
    RANDOM-failure twin of :func:`attack_robustness`: each vertex fails
    when its deterministic md5 coin (split.split_key — the repo's
    engine-replayable uniform) lands below f.  Contrast with the
    targeted curve is the Albert–Jeong–Barabási result itself: scale-free
    graphs barely notice random failure at fractions that shatter them
    under hub attack."""
    from tric_spark.operators.cc import connected_components
    from tric_spark.operators.split import split_key

    spark = sym_edges.sparkSession
    n = degrees.count()
    coin = split_key(F.col("vid"), seed=seed)
    rows = []
    for f in fractions:
        kept = degrees.select("vid", coin.alias("u")).filter(
            F.col("u") >= F.lit(float(f))
        ).select("vid")
        kept_sym = sym_edges.join(
            kept.withColumnRenamed("vid", "src"), "src", "left_semi"
        ).join(kept.withColumnRenamed("vid", "dst"), "dst", "left_semi")
        n_kept = kept.count()
        giant = 0
        if n_kept:
            giant = (
                connected_components(kept_sym, kept)
                .groupBy("comp")
                .agg(F.count(F.lit(1)).alias("s"))
                .agg(F.max("s").alias("g"))
                .first()[0]
                or 0
            )
        rows.append(
            (
                float(f),
                int(n - n_kept),
                int(n_kept),
                int(giant),
                round(giant / n_kept, 6) if n_kept else None,
            )
        )
    return spark.createDataFrame(
        rows,
        "frac double, n_removed long, n_remaining long, giant_size long,"
        " giant_frac double",
    )
