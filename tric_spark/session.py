"""SparkSession builder with the physical-execution defaults this engine needs.

Mirrors the reference's runtime knobs (buffered communication, balanced
partitioning — graph.hpp:453–498, utils.hpp:101) with their Spark analogs:
AQE partition coalescing + skew-join splitting, Arrow-batched Python exchange,
and an explicit shuffle-partition count sized to the data.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "tric-spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for the link-graph workload.

    ``cores`` pins ``local[N]`` — used by the scaling benchmark to run the
    identical job at two parallelism levels (the sandbox stand-in for the
    N→4N-executor criterion). On a real cluster the master comes from
    spark-submit and this builder only contributes conf.
    """
    if cores is not None:
        master = f"local[{cores}]"
    else:
        master = os.environ.get("SPARK_GRAFT_MASTER", "local[*]")

    sp = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
    )

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
        )
        # AQE = the reference's balanced/batched communication, for free:
        # runtime partition coalescing ≈ buffered sends (utils.hpp:101),
        # skew-join splitting ≈ the -b balanced read (graph.hpp:503–614).
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow-batched Python exchange — all Python kernels are vectorized
        # over Arrow batches, never per-row (north-rule invariant).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.shuffle.partitions", str(sp))
        # Runtime bloom-filter join pruning ≈ the reference's Bloom
        # pre-filters (hbufastric.hpp:270–314) — pre-filter only, always
        # confirmed exactly by the join, so counts stay exact.
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        # dims up to 32 MB broadcast instead of shuffling — vertex-stats /
        # adjacency tables of mid-size graphs ride this; size-gated so a
        # 100 TB adjacency still shuffles (AQE converts at runtime)
        .config("spark.sql.autoBroadcastJoinThreshold", "32m")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
