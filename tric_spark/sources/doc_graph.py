"""Deterministic link graph derived from the driver's ``documents`` table.

The driver's correctness gate replays each query in DuckDB, so the graph
derivation must be expressible identically in Spark and ANSI SQL
(FIXTURES.md §4): per doc, out-degree = 1 + n_chars % 5; target j (j=1..deg)
is (doc_id*37 + n_chars*17 + j*j) % n_docs; self-loops dropped; undirected
canonical = distinct (least, greatest).

All arithmetic stays in nonneg int64 well below overflow, so Spark and
DuckDB agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tric_spark.sources.tables import load_table

# SQL fragment replayed by the DuckDB oracle — single source of truth for
# the derivation (kept textually here so oracle_sql() composes it).
DOC_EDGES_SQL = """
  nd AS (SELECT count(*) AS c FROM documents),
  raw AS (
    SELECT doc_id AS a,
           (doc_id*37 + n_chars*17 + j*j) % (SELECT c FROM nd) AS b
    FROM (SELECT doc_id, n_chars,
                 unnest(generate_series(1, 1 + n_chars % 5)) AS j
          FROM documents)
  ),
  und AS (
    SELECT DISTINCT least(a,b) AS src, greatest(a,b) AS dst
    FROM raw WHERE a <> b
  ),
  sym AS (SELECT src, dst FROM und UNION ALL SELECT dst, src FROM und),
  deg AS (SELECT src AS vid, count(*) AS degree FROM sym GROUP BY src)
"""

# the DIRECTED link graph (self-loops dropped, parallel links deduped,
# direction KEPT) — the input for direction-sensitive kernels (HITS)
DOC_DIRECTED_SQL = """
  dlinks AS (SELECT DISTINCT a AS src, b AS dst FROM raw WHERE a <> b)
"""


def doc_edges(spark, sf_dir: str) -> DataFrame:
    """Canonical undirected (src, dst) with src < dst — matches ``und``."""
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    raw = (
        docs.select("doc_id", "n_chars")
        .withColumn(
            "j", F.explode(F.sequence(F.lit(1), F.lit(1) + F.col("n_chars") % 5))
        )
        .select(
            F.col("doc_id").alias("a"),
            (
                (F.col("doc_id") * 37 + F.col("n_chars") * 17 + F.col("j") * F.col("j"))
                % F.lit(n)
            ).alias("b"),
        )
    )
    return (
        raw.filter(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("src"), F.greatest("a", "b").alias("dst"))
        .dropDuplicates(["src", "dst"])
    )


def doc_edges_directed(spark, sf_dir: str) -> DataFrame:
    """Directed deduped (src, dst), self-loops dropped — matches ``dlinks``.
    Directionality is the point: HITS-style kernels need who-links-whom,
    not the canonicalized undirected view."""
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    raw = (
        docs.select("doc_id", "n_chars")
        .withColumn(
            "j", F.explode(F.sequence(F.lit(1), F.lit(1) + F.col("n_chars") % 5))
        )
        .select(
            F.col("doc_id").alias("src"),
            (
                (F.col("doc_id") * 37 + F.col("n_chars") * 17 + F.col("j") * F.col("j"))
                % F.lit(n)
            ).alias("dst"),
        )
    )
    return raw.filter(F.col("src") != F.col("dst")).dropDuplicates(["src", "dst"])
