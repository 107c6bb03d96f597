"""Count-Min sketch over token streams — bounded-memory frequency
estimation. [pipeline family: the sketch that answers "how often" the way
Bloom answers "whether" — the reference's sketch usage is its Bloom
pre-filters (hbufastric.hpp:65–148); CMS extends the family]

Cormode & Muthukrishnan (J. Algorithms 55(1), 2005): depth×width counters;
item i increments one counter per row (hash_d(i)); the estimate is the min
over rows — always ≥ the true count, within εn with probability 1−δ for
width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉. THE bounded-state way to track token /
URL / host frequencies on an unbounded stream.

Determinism (engine rule): row d's bucket is md5("cms:{seed}:{d}:{token}")
mod width — a pure function, identical at any parallelism, replayable in
DuckDB. Build is one explode (depth rows per token occurrence) + one
map-side-combined groupBy (d, bucket): the sketch is depth·width rows NO
MATTER the corpus size — that bound is the entire point. Lookup joins
candidates against the sketch on (d, bucket) and takes min per token.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(token: Column, d: int, width: int, seed: int) -> Column:
    h = F.md5(
        F.concat_ws(
            ":", F.lit("cms"), F.lit(str(seed)), F.lit(str(d)), token
        )
    )
    return F.pmod(
        F.conv(F.substring(h, 1, 12), 16, 10).cast("long"), F.lit(width)
    )


def cms_build(
    tokens: DataFrame,
    width: int = 1024,
    depth: int = 4,
    seed: int = 42,
    token_col: str = "token",
) -> DataFrame:
    """(d, bucket, cnt) — the sketch, ≤ depth·width rows total."""
    t = F.col(token_col)
    rows = tokens.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _bucket(t, d, width, seed).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("c")
    )
    return rows.groupBy(F.col("c.d").alias("d"), F.col("c.bucket").alias("bucket")).agg(
        F.count(F.lit(1)).alias("cnt")
    )


def cms_lookup(
    sketch: DataFrame,
    candidates: DataFrame,
    width: int = 1024,
    depth: int = 4,
    seed: int = 42,
    token_col: str = "token",
) -> DataFrame:
    """(token, est) — the CMS estimate (min over rows; missing buckets are
    0) for each DISTINCT candidate token. Never underestimates."""
    t = F.col(token_col)
    probes = candidates.select(t.alias("token")).distinct().select(
        "token",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _bucket(F.col("token"), d, width, seed).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("c"),
    ).select("token", F.col("c.d").alias("d"), F.col("c.bucket").alias("bucket"))
    return (
        probes.join(sketch, ["d", "bucket"], "left")
        .groupBy("token")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
    )


def cms_heavy_hitters(
    docs: DataFrame,
    k: int = 10,
    width: int = 1024,
    depth: int = 4,
    seed: int = 42,
) -> DataFrame:
    """(token, est, exact, rank) — top-``k`` corpus tokens by CMS estimate
    (est desc, token asc), with the exact count alongside so the
    overestimate is visible (est ≥ exact ALWAYS; equal when the token's
    buckets are collision-light). Two-phase partial top-k over the
    estimate table — the batch validation harness for the sketch; on a
    stream the sketch updates incrementally and this readout runs per
    trigger."""
    from pyspark.sql import Window

    from tric_spark.operators.textstats import tokens_col

    toks = docs.select(
        F.explode(F.filter(tokens_col(), lambda t: t != F.lit(""))).alias("token")
    )
    sketch = cms_build(toks, width, depth, seed)
    est = cms_lookup(sketch, toks, width, depth, seed)
    exact = toks.groupBy("token").agg(F.count(F.lit(1)).alias("exact"))
    scored = est.join(exact, "token")
    part = Window.partitionBy("_pid").orderBy(F.desc("est"), F.asc("token"))
    survivors = (
        scored.withColumn("_pid", F.spark_partition_id())
        .withColumn("_rn", F.row_number().over(part))
        .filter(F.col("_rn") <= k)
        .drop("_pid", "_rn")
    )
    w = Window.orderBy(F.desc("est"), F.asc("token"))
    return survivors.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
