"""Directed-link-graph structure statistics: link reciprocity and degree
assortativity — the two standard one-pass diagnostics a web-graph study
reports alongside degree distributions (reference computes the analogous
per-graph summary in graph.hpp:271-305's dist-stats sink; these extend it
to the directed corpus graph).

Both are pure DataFrame aggregates: one self-join (semi) for reciprocity,
two degree joins + a Pearson ``corr`` for assortativity. No Python, no
driver loops; every number is rounded 6dp so the DuckDB oracle replays it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _clean_directed(directed: DataFrame) -> DataFrame:
    """Distinct non-loop directed edges — the universe both metrics use."""
    return (
        directed.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def reciprocal_pairs(directed: DataFrame) -> DataFrame:
    """(src, dst) with src < dst — unordered pairs linked in BOTH
    directions. Left-semi against the reversed edge set, then the src<dst
    filter emits each mutual pair exactly once."""
    e = _clean_directed(directed)
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return (
        e.join(rev, ["src", "dst"], "left_semi")
        .filter(F.col("src") < F.col("dst"))
    )


def reciprocity(directed: DataFrame) -> DataFrame:
    """One row (n_edges, n_reciprocal, reciprocity): reciprocity is the
    fraction of distinct non-loop directed edges whose reverse also exists
    (2·|mutual pairs| / |edges|) — the standard digraph reciprocity
    coefficient."""
    e = _clean_directed(directed).cache()
    n = e.count()
    mutual = reciprocal_pairs(e).agg(F.count(F.lit(1)).alias("m"))
    return mutual.select(
        F.lit(n).alias("n_edges"),
        (F.col("m") * 2).alias("n_reciprocal"),
        F.round((F.col("m") * 2) / F.lit(max(n, 1)), 6).alias("reciprocity"),
    )


def degree_assortativity(sym_edges: DataFrame, degrees: DataFrame) -> DataFrame:
    """One row (assortativity): Pearson correlation between the endpoint
    degrees over every directed representation of an undirected edge
    (``sym_edges`` carries both directions, so each edge contributes both
    orderings — the Newman 2002 definition). Sample-vs-population
    normalization cancels inside a correlation, so Spark's ``corr`` and
    DuckDB's ``corr`` agree bit-for-bit at 6dp."""
    du = degrees.select(F.col("vid").alias("src"), F.col("degree").alias("du"))
    dv = degrees.select(F.col("vid").alias("dst"), F.col("degree").alias("dv"))
    return (
        sym_edges.join(du, "src")
        .join(dv, "dst")
        .agg(F.round(F.corr("du", "dv"), 6).alias("assortativity"))
    )


def powerlaw_alpha(degrees: DataFrame, d_min: int = 2) -> DataFrame:
    """One row (alpha, sigma, n_tail, d_min) — the continuous-MLE power-law
    exponent of the degree distribution (Clauset, Shalizi & Newman, SIAM
    Rev. 51(4), 2009 eq. 3.1): α = 1 + n / Σ ln(d_i / (d_min − ½)) over the
    tail d_i ≥ d_min, with standard error σ = (α−1)/√n. THE number every
    web-graph measurement paper reports (the web's in-degree exponent
    ≈ 2.1, Broder et al. 2000); the ½-shift is the standard discrete-data
    correction. One filter + one aggregate — no sort, no collect; 6dp."""
    tail = degrees.select(F.col("degree").cast("double").alias("d")).filter(
        F.col("d") >= float(d_min)
    )
    agg = tail.agg(
        F.count(F.lit(1)).alias("n_tail"),
        F.sum(F.log(F.col("d") / (float(d_min) - 0.5))).alias("_s"),
    )
    return agg.select(
        F.round(F.lit(1.0) + F.col("n_tail") / F.col("_s"), 6).alias("alpha"),
        F.round(
            (F.col("n_tail") / F.col("_s")) / F.sqrt(F.col("n_tail")), 6
        ).alias("sigma"),
        F.col("n_tail").cast("long").alias("n_tail"),
        F.lit(d_min).cast("long").alias("d_min"),
    )
