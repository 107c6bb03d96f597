"""Deterministic (hash-seeded) corpus sampling — the training-data-mix
primitive: downsample a crawl per language/quality stratum at exact,
reproducible rates. Not in the reference; pipeline breadth.

Why not df.sample(): Spark's sampler is seeded per-partition, so the kept
set changes with partitioning/parallelism — useless for reproducible data
mixes and impossible to oracle-check. Here the keep decision is a pure
function of (seed, key): keep iff

    int(hex(md5("smp:{seed}:{key}"))[0:12], 16) mod RESOLUTION < rate·RESOLUTION

— the same rows survive at any parallelism, re-crawls of unchanged docs
sample identically (stable dedup-friendly behavior), the realized rate is
within ~1/sqrt(n·rate) of the target, and DuckDB replays the exact kept
set. Thresholds are compared as INTEGERS (rate quantized to 1/RESOLUTION)
so there is no float boundary on either engine. All JVM built-ins,
whole-stage codegen, zero shuffles — the filter pushes down onto the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

RESOLUTION = 1_000_000  # rate quantum = 1e-6


def _bucket(key: Column, seed: int) -> Column:
    """Uniform int bucket in [0, RESOLUTION) from md5 — 12 hex digits
    (48 bits) parsed exactly on both engines."""
    h = F.md5(F.concat_ws(":", F.lit("smp"), F.lit(str(seed)), key.cast("string")))
    return F.pmod(
        F.conv(F.substring(h, 1, 12), 16, 10).cast("long"), F.lit(RESOLUTION)
    )


def deterministic_sample(
    df: DataFrame, rate: float, key_col: str, seed: int = 42
) -> DataFrame:
    """Keep a deterministic ``rate`` fraction of rows, decided per
    ``key_col`` value (rows sharing a key live or die together — sample by
    document, user, url, ... regardless of row multiplicity)."""
    thr = int(rate * RESOLUTION)
    return df.filter(_bucket(F.col(key_col), seed) < F.lit(thr))


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str,
    key_col: str,
    default_rate: float = 0.0,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum deterministic sampling — THE data-mix operator: e.g.
    keep 100% of rare languages, 25% of English, 0% of unknown. ``rates``
    maps stratum value → keep rate; strata absent from the map use
    ``default_rate``. The threshold is a when-chain literal (broadcast-free,
    codegen'd); the hash bucket is shared with deterministic_sample, so a
    stratified pass at rate r keeps exactly the rows a flat pass at rate r
    keeps within each stratum (nested/repeated sampling composes)."""
    thr = F.lit(int(default_rate * RESOLUTION))
    for value, rate in sorted(rates.items()):
        thr = F.when(
            F.col(strata_col) == F.lit(value), F.lit(int(rate * RESOLUTION))
        ).otherwise(thr)
    return df.filter(_bucket(F.col(key_col), seed) < thr)


def es_key(weight: Column, key: Column, seed: int = 42) -> Column:
    """The Efraimidis–Spirakis A-ES sampling key u^(1/w) (Inf. Proc.
    Letters 97(5), 2006), 6dp-ROUNDED: taking the k largest keys draws a
    weighted sample WITHOUT replacement where row i's inclusion odds are
    proportional to ``weight``. u is the deterministic md5 uniform shared
    with :func:`deterministic_sample` (same at any parallelism, replayable
    in DuckDB), shifted by half a quantum so u ∈ (0,1) exactly — never 0,
    so the pow is total. Rounding the RANKING key to 6dp is the
    crawl-frontier lesson (operators/frontier.py): raw float order is not
    engine-portable across Spark/DuckDB pow implementations; ties at 6dp
    are broken by the caller's deterministic id ordering on both sides."""
    u = (_bucket(key, seed).cast("double") + F.lit(0.5)) / F.lit(float(RESOLUTION))
    return F.round(F.pow(u, F.lit(1.0) / weight.cast("double")), 6)


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    key_col: str,
    seed: int = 42,
) -> DataFrame:
    """k-row weighted sample without replacement (Efraimidis–Spirakis
    A-ES): rows ranked by :func:`es_key` descending, ties by ``key_col``
    ascending; rows with NULL or non-positive weight never sample (they
    have zero mass — filtered up front, matching the algorithm's w > 0
    domain). THE training-data-mix primitive for quality-weighted corpus
    selection (sample documents ∝ quality score).

    Scale shape: orderBy(...).limit(k) compiles to a distributed
    TakeOrderedAndProject — every partition keeps its local top-k and only
    k rows ever reach one place; the corpus is never globally sorted. The
    key is all JVM built-ins (md5/conv/pow), whole-stage codegen'd."""
    w = F.col(weight_col).cast("double")
    scored = df.filter(w.isNotNull() & (w > 0)).withColumn(
        "es_key", es_key(w, F.col(key_col), seed)
    )
    return scored.orderBy(F.desc("es_key"), F.col(key_col)).limit(k)


def weighted_sample_stratified(
    df: DataFrame,
    k: int,
    weight_col: str,
    key_col: str,
    strata_col: str,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum k-row weighted sample: the A-ES rank runs independently
    inside each ``strata_col`` group (k docs per language, per host, ...).
    Window top-k per group — the same per-host politeness shape as
    frontier.frontier_topk_per_host; the md5 uniform is shared with
    :func:`weighted_sample`, so a stratum's winners are exactly the flat
    sample's winners restricted to that stratum's rows and rank depth."""
    from pyspark.sql import Window

    w = F.col(weight_col).cast("double")
    scored = df.filter(w.isNotNull() & (w > 0)).withColumn(
        "es_key", es_key(w, F.col(key_col), seed)
    )
    win = Window.partitionBy(strata_col).orderBy(F.desc("es_key"), F.col(key_col))
    return (
        scored.withColumn("_rk", F.row_number().over(win))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )
