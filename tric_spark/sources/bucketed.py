"""Bucketed edge tables — shuffle-free co-located joins.

The reference's 1-D vertex partitioning (``parts_``/``get_owner``,
graph.hpp:124–188) makes every rank own its vertices' edges so probes know
their destination without redistribution. The Spark durable analog is a
bucketed table: ``bucketBy(src)`` fixes the hash layout on disk, and any
join/groupBy keyed on src reads it without an Exchange — the big join's
shuffle is paid once at write time, then amortized over every query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_edges(
    edges: DataFrame, table: str, buckets: int = 64, sort: bool = True
) -> None:
    """Persist an edge table bucketed (and optionally sorted) by src."""
    w = edges.write.mode("overwrite").bucketBy(buckets, "src")
    if sort:
        w = w.sortBy("src", "dst")
    w.saveAsTable(table, format="parquet")


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
