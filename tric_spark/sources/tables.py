"""Loaders for the driver-provided parquet tables (TESTDATA.md).

At production scale these are Iceberg tables (``spark.read.format("iceberg")
.load(...)``); in the sandbox they are plain parquet files under
``/root/testdata/sf*/``. The loader keeps the call-sites format-agnostic.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one named table from an sf directory (parquet) or an Iceberg
    namespace (``iceberg:<catalog.db>`` prefix)."""
    if sf_dir.startswith("iceberg:"):
        ns = sf_dir.split(":", 1)[1]
        return spark.read.format("iceberg").load(f"{ns}.{name}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# formats Spark bundles natively — no extra jars, verified in-sandbox
NATIVE_FORMATS = ("parquet", "orc", "json", "csv")


def save_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str | None = None,
) -> None:
    """Write a table in any natively-bundled columnar/row format.

    ``partition_by`` produces hive-style directory partitioning —
    downstream filters on those columns become partition PRUNING (the
    scan never opens excluded directories), which at 100 TB is the
    difference between reading one day and reading the corpus.
    """
    if fmt not in NATIVE_FORMATS:
        raise ValueError(f"format {fmt!r} not in {NATIVE_FORMATS}")
    w = df.write.mode(mode).format(fmt)
    if fmt == "csv":
        w = w.option("header", True)
    if compression:
        w = w.option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def load_any(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: str | None = None,
) -> DataFrame:
    """Read back a table written by :func:`save_table`.  Columnar formats
    (parquet/orc) carry their schema; for csv/json pass a DDL ``schema``
    string to avoid an inference scan (the edgelist-reader rule) — without
    one, csv reads everything as strings."""
    if fmt not in NATIVE_FORMATS:
        raise ValueError(f"format {fmt!r} not in {NATIVE_FORMATS}")
    r = spark.read.format(fmt)
    if fmt == "csv":
        r = r.option("header", True)
    if schema:
        r = r.schema(schema)
    return r.load(path)
