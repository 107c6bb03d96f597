"""Lineage/stats cutting for iterative kernels.

``df.localCheckpoint(eager=True)`` cuts the LOGICAL PLAN to a LogicalRDD
leaf but PRESERVES the origin plan's cost statistics on that leaf
(LogicalRDD.originStats). For a superstep that references its state
MORE THAN ONCE (self-joins: pointer doubling, 2-cycle resolves,
large/small-star), Catalyst's SizeInBytesOnlyStatsPlanVisitor multiplies
child sizes at every join, so the checkpointed leaf's sizeInBytes
SQUARES per superstep — an exponential BigInt that the optimizer
(InjectRuntimeFilter, JoinSelection.canBroadcastBySize) then multiplies
on every subsequent planning pass. Measured on Borůvka MST: bit-lengths
11 → 20 → 39 → 77 → 153 per checkpoint; by round 3 on a 500-vertex graph
the driver spent 4+ minutes inside BigInteger.multiplyToomCook3 while
every frame held ≤ 500 rows.

Single-reference supersteps (PageRank's chain) only grow the estimate
additively in bit-length and never hit this; every kernel whose step
joins its state against itself MUST cut the stats too, not just the
plan.

:func:`checkpoint_cut` does both: localCheckpoint, then re-wrap the
ALREADY-MATERIALIZED InternalRow RDD in a fresh LogicalRDD carrying no
origin stats (falls back to spark.sql.defaultSizeInBytes — a constant).
Zero recomputation: `queryExecution().toRdd()` on the checkpointed frame
returns the checkpointed RDD itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def checkpoint_cut(df: DataFrame) -> DataFrame:
    """Eager localCheckpoint that cuts BOTH lineage and origin stats."""
    ck = df.localCheckpoint(eager=True)
    jdf = ck._jdf
    jspark = df.sparkSession._jsparkSession
    # private[sql] in Scala compiles to a public JVM method, so py4j can
    # call it; signature (RDD[InternalRow], StructType, isStreaming)
    jdf2 = jspark.internalCreateDataFrame(
        jdf.queryExecution().toRdd(), jdf.schema(), False
    )
    return DataFrame(jdf2, df.sparkSession)


def stats_size_bits(df: DataFrame) -> int:
    """Bit-length of the optimizer's sizeInBytes estimate — the regression
    probe for the exponential-stats failure mode (tests assert this stays
    bounded across supersteps)."""
    return int(
        df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    ).bit_length()
