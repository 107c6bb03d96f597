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
