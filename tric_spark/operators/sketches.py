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


# ---------------------------------------------------------------------------
# Bloom filter — bounded-memory set membership
# ---------------------------------------------------------------------------
#
# Bloom (CACM 13(7), 1970): n_bits bits, k hash functions; insert sets k
# bits, a probe answers "definitely not present" or "present with false-
# positive rate ~(1 - e^{-kn/m})^k". The reference uses Bloom filters as
# its edge-probe pre-filter (hbufastric.hpp:65-148, there via two Murmur
# hashes); here the sketch is ALSO a first-class user-facing operator —
# the way a crawl pipeline screens "have I seen this URL/token/shingle"
# against a reference corpus without shipping the corpus.
#
# Same determinism rule as the CMS above: bit i of a token is
# md5("bloom:{seed}:{i}:{token}") first 12 hex digits mod n_bits — pure,
# parallelism-independent, replayable verbatim in DuckDB. The built
# filter is at most n_bits rows (the set bits), so probing is a broadcast
# join no matter how large the reference corpus was.


def _bloom_bits(token: Column, k: int, n_bits: int, seed: int) -> Column:
    """array<long> of the k bit positions for one token."""
    return F.array(
        *[
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                ":",
                                F.lit("bloom"),
                                F.lit(str(seed)),
                                F.lit(str(i)),
                                token,
                            )
                        ),
                        1,
                        12,
                    ),
                    16,
                    10,
                ).cast("long"),
                F.lit(n_bits),
            )
            for i in range(k)
        ]
    )


def bloom_build(
    tokens: DataFrame,
    n_bits: int = 8192,
    k: int = 4,
    seed: int = 7,
    token_col: str = "token",
) -> DataFrame:
    """(bit,) — the DISTINCT set bit positions; ≤ n_bits rows total.

    One explode (k rows per distinct token) + one distinct — map-side
    combined, output bounded by the filter size, never the corpus."""
    return (
        tokens.select(
            F.explode(
                _bloom_bits(F.col(token_col), k, n_bits, seed)
            ).alias("bit")
        )
        .distinct()
    )


def bloom_probe(
    candidates: DataFrame,
    bloom: DataFrame,
    n_bits: int = 8192,
    k: int = 4,
    seed: int = 7,
    token_col: str = "token",
) -> DataFrame:
    """(token, hit) for each DISTINCT candidate: hit=true iff all k bits
    are set (no false negatives ever; false positives at the configured
    rate). The filter side is ≤ n_bits rows → broadcast join; the
    candidate side streams."""
    probes = (
        candidates.select(F.col(token_col).alias("token"))
        .distinct()
        .select(
            "token",
            F.explode(
                _bloom_bits(F.col("token"), k, n_bits, seed)
            ).alias("bit"),
        )
    )
    marked = probes.join(
        F.broadcast(bloom.withColumn("set", F.lit(1))), "bit", "left"
    )
    return marked.groupBy("token").agg(
        (F.count(F.lit(1)) == F.sum(F.coalesce("set", F.lit(0)))).alias("hit")
    )
