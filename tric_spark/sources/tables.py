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
