"""Approximate Neighborhood Function (HyperANF, Boldi–Vigna WWW'11) and its
exact small-radius companion — the canonical web-graph distance analytics:
N(h) = how many ordered pairs are within distance h, and from its curve the
effective diameter (smallest h reaching 90% of all reachable pairs).

Not in the reference (tric counts triangles only); engine breadth for the
web-scale tier — HyperANF is THE published algorithm for measuring the
diameter of the web graph (it produced the "four degrees of separation"
Facebook measurement), and its register-passing supersteps are exactly the
engine's PageRank-shaped one-shuffle gather.

Design for oracle parity (the engine's discipline: every operator DuckDB
can express gets a hash-checked replay): the per-vertex HyperLogLog sketch
uses m=16 registers seeded from md5 — engine-portable, unlike xxhash64 —
so the ENTIRE approximate algorithm (init, elementwise-max supersteps,
bias-corrected estimate with linear-counting small-range correction)
replays bit-for-bit in SQL. Registers live in 16 int COLUMNS, not an
array: the per-hop neighbor merge is then a plain groupBy with 16 max()
aggregates — map-side partial aggregation bounds the shuffle at one row
per (dst, partition), and the whole superstep is JVM whole-stage codegen
(an array form would need explode + reassembly, two shuffles and no
partial agg).

Accuracy envelope: m=16 gives ~26% per-vertex standard error, but N(h)
sums n independent per-vertex estimates, so the curve's relative error
shrinks ~1/sqrt(n) on top (tests assert ≤15% vs the exact BFS counts at
n=300). Raise b for production precision (cost is linear in m).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tric_spark.plans.lineage import checkpoint_cut

M = 16            # registers per vertex (b = 4 index bits)
ALPHA_16 = 0.673  # standard HLL bias constant for m=16
FIELD_BITS = 48   # rho field: 12 hex digits of the md5
_REGS = [f"r{k}" for k in range(M)]


def _init_reg_cols(vid, seed: str):
    """Register columns for a single-element sketch {vid}: md5-derived
    index j (first hex digit) and rank rho (leading zeros of the next 48
    bits + 1). Pure column expressions — replayed verbatim in SQL."""
    h = F.md5(F.concat_ws(":", F.lit(seed), vid.cast("string")))
    j = F.conv(F.substring(h, 1, 1), 16, 10).cast("int")
    field = F.conv(F.substring(h, 2, 12), 16, 10).cast("long")
    rho = F.when(field == 0, F.lit(FIELD_BITS + 1)).otherwise(
        F.lit(FIELD_BITS + 1) - F.length(F.bin(field))
    )
    return [
        F.when(j == k, rho).otherwise(F.lit(0)).cast("int").alias(f"r{k}")
        for k in range(M)
    ]


def _estimate_col():
    """Per-vertex ball-cardinality estimate from the 16 register columns:
    raw = alpha·m²/Σ2^-r, linear counting m·ln(m/V) when raw ≤ 2.5m and
    zero registers remain (the standard HLL small-range branch — balls ARE
    small at low h, so this branch carries the low-h curve)."""
    z = reduce(
        lambda a, b: a + b, [F.pow(F.lit(2.0), -F.col(r)) for r in _REGS]
    )
    v = reduce(
        lambda a, b: a + b,
        [(F.col(r) == 0).cast("int") for r in _REGS],
    )
    raw = F.lit(ALPHA_16 * M * M) / z
    return F.when(
        (raw <= F.lit(2.5 * M)) & (v > 0),
        F.lit(float(M)) * F.log(F.lit(float(M)) / v),
    ).otherwise(raw)


def hyper_anf(
    sym_edges: DataFrame,
    vertices: DataFrame,
    max_h: int = 8,
    seed: str = "anf",
    broadcast_state_max_rows: int | None = None,
) -> DataFrame:
    """(h, nf) for h = 0..max_h: nf ≈ Σ_v |ball(v, h)| — the neighborhood
    function (h=0 row ≈ n, a built-in sanity anchor). One superstep per
    hop: every vertex takes the elementwise max of its own and its
    neighbors' registers; localCheckpoint per hop truncates lineage. The
    per-h estimates are computed lazily from each hop's checkpointed state
    and unioned — n-row scans, no extra shuffles.

    r6 hop shapes (identical register values either way — max is
    order-free):

    - GATHER (n ≤ ``broadcast_state_max_rows``, default env
      ``SPARK_GRAFT_ANF_BCAST_MAX`` = 2,000,000): the in-adjacency is
      cached hash-partitioned on vid; per hop, explode + BROADCAST join of
      the n-row register state + a groupBy on the partition-preserved vid
      + a co-partitioned left join back to the state — zero shuffle of the
      m-row message volume per hop (the old shape shuffled ~m·M register
      ints every hop, and random dst order made map-side partial
      aggregation nearly useless).
    - SCATTER (above the gate): the original edges⋈state → groupBy shape —
      broadcasting an n-row state is not scale-safe past ~10⁶ vertices, so
      big graphs keep the shuffle (guide §3.1: broadcast only what fits).
    """
    import os

    state = vertices.select(
        "vid", *_init_reg_cols(F.col("vid"), seed)
    ).localCheckpoint(eager=True)
    states = [state]
    edges = sym_edges.select("src", "dst")
    gate = (
        broadcast_state_max_rows
        if broadcast_state_max_rows is not None
        else int(os.environ.get("SPARK_GRAFT_ANF_BCAST_MAX", "2000000"))
    )
    if state.count() <= gate:
        in_adj = (
            edges.groupBy(F.col("dst").alias("vid"))
            .agg(F.collect_list("src").alias("nbrs"))
            .cache()
        )
        for _ in range(max_h):
            nbr_max = (
                in_adj.select("vid", F.explode("nbrs").alias("src"))
                .join(F.broadcast(state.withColumnRenamed("vid", "src")), "src")
                .groupBy("vid")
                .agg(*[F.max(r).alias(f"_m{r}") for r in _REGS])
            )
            state = (
                state.join(F.broadcast(nbr_max), "vid", "left")
                .select(
                    "vid",
                    *[
                        F.greatest(
                            F.col(r), F.coalesce(F.col(f"_m{r}"), F.lit(0))
                        ).alias(r)
                        for r in _REGS
                    ],
                )
            )
            state = checkpoint_cut(state)
            states.append(state)
        in_adj.unpersist()
    else:
        for _ in range(max_h):
            msgs = edges.join(
                state.withColumnRenamed("vid", "src"), "src"
            ).select(F.col("dst").alias("vid"), *_REGS)
            state = (
                msgs.unionByName(state)
                .groupBy("vid")
                .agg(*[F.max(r).alias(r) for r in _REGS])
                .localCheckpoint(eager=True)
            )
            states.append(state)

    est = _estimate_col()
    curves = [
        st.agg(F.round(F.sum(est), 6).alias("nf")).select(
            F.lit(h).cast("long").alias("h"), "nf"
        )
        for h, st in enumerate(states)
    ]
    return reduce(lambda a, b: a.unionByName(b), curves)


def effective_diameter(curve: DataFrame, fraction: float = 0.9) -> float:
    """Effective diameter from an (h, nf) curve: the (interpolated)
    smallest h where nf reaches ``fraction`` of the final plateau — the
    standard HyperANF readout. Driver-side over the tiny curve table."""
    rows = sorted((r["h"], r["nf"]) for r in curve.collect())
    if not rows:
        return 0.0
    target = fraction * rows[-1][1]
    prev_h, prev_nf = rows[0]
    if prev_nf >= target:
        return float(prev_h)
    for h, nf in rows[1:]:
        if nf >= target:
            if nf == prev_nf:
                return float(h)
            return prev_h + (target - prev_nf) / (nf - prev_nf)
        prev_h, prev_nf = h, nf
    return float(rows[-1][0])


def k_hop_counts(sym_edges: DataFrame, k: int = 2) -> DataFrame:
    """Exact |{u ≠ v : dist(v,u) ≤ k}| per vertex — the exact companion
    HyperANF approximates (and the oracle-checkable driver query). Per-hop
    frontier: reach ∪ (reach ⋈ edges), deduped per hop so the intermediate
    stays ≤ n² rows, never the path count. Exact k-hop sets are O(n·ball)
    — fine for small k / validation; HyperANF is the scale path."""
    edges = sym_edges.select("src", "dst")
    reach = edges.select(F.col("src").alias("vid"), F.col("dst").alias("nbr"))
    cur = reach
    for _ in range(k - 1):
        cur = (
            cur.join(edges.withColumnRenamed("src", "nbr"), "nbr")
            .select("vid", F.col("dst").alias("nbr"))
            .distinct()
        )
        reach = reach.unionByName(cur).distinct()
    return (
        reach.filter(F.col("nbr") != F.col("vid"))
        .groupBy("vid")
        .agg(F.count("*").alias("n_reach"))
    )


def effective_diameter_from_curve(curve: DataFrame, ratio: float = 0.9) -> DataFrame:
    """One row (d_eff, h_ceil, nf_max) — the interpolated effective
    diameter from a neighborhood-function curve (h, nf): the smallest h
    where nf(h) ≥ ratio·nf(h_max), linearly interpolated between h−1 and
    h (the ANF/HyperANF reporting convention, Palmer et al. KDD'02 §3;
    Boldi–Rosa–Vigna WWW'11 report exactly this number). Callers pass a
    6dp-ROUNDED curve so the interpolation arithmetic starts from
    engine-identical inputs (hyper_anf's estimates are bit-replayable,
    the global sums are rounded — see _anf_sql's contract).

    The curve is max_h+1 rows, so the unpartitioned lag window is a
    ≤-dozen-row single partition BY CONSTRUCTION — not a scale hazard."""
    from pyspark.sql import Window

    mx = curve.orderBy(F.desc("h")).limit(1).select(F.col("nf").alias("nfm"))
    w = Window.orderBy("h")
    fl = (
        curve.withColumn("prev", F.lag("nf").over(w))
        .crossJoin(F.broadcast(mx))
    )
    hit = (
        fl.filter(F.col("nf") >= F.lit(ratio) * F.col("nfm"))
        .orderBy("h")
        .limit(1)
    )
    target = F.lit(ratio) * F.col("nfm")
    return hit.select(
        F.when(F.col("prev").isNull(), F.lit(0.0))
        .otherwise(
            F.round(
                F.col("h") - 1
                + (target - F.col("prev")) / (F.col("nf") - F.col("prev")),
                6,
            )
        )
        .alias("d_eff"),
        F.col("h").cast("long").alias("h_ceil"),
        F.col("nfm").alias("nf_max"),
    )


def hll_count_distinct(
    df: DataFrame, col: str, seed: str = "hll"
) -> DataFrame:
    """One row (est, n_rows) — HyperLogLog distinct-count of ``col`` using
    the SAME m=16 md5 register machinery as hyper_anf (Flajolet et al.
    2007), as a standalone sketch: ONE groupBy-free aggregation pass (16
    max() aggregates, map-side combined, constant state per partition) —
    the bounded-memory count-distinct for unbounded streams and 100-TB
    columns, deterministic and replayed verbatim in SQL. m=16 gives
    ~26% standard error (1.04/√16) — this module's plumbing, not a tuned
    production sketch; widen M for precision. Spark's own
    approx_count_distinct is the JVM alternative but is NOT
    oracle-replayable (its hash is engine-internal), which is why this
    exists."""
    rows = df.select(*_init_reg_cols(F.col(col), seed))
    regs = rows.agg(
        *[F.max(r).alias(r) for r in _REGS],
        F.count(F.lit(1)).alias("_n"),
    )
    return regs.select(
        F.round(_estimate_col(), 6).alias("est"),
        F.col("_n").alias("n_rows"),
    )


def hll_count_distinct_by(
    df: DataFrame, key_col: str, col: str, seed: str = "hll"
) -> DataFrame:
    """(key, est, n_rows) — the per-key form of :func:`hll_count_distinct`:
    HLL registers accumulated inside ONE groupBy(key), which is the
    property that makes the sketch worth having at scale — the state per
    key is m registers REGARDLESS of cardinality, the partial aggregates
    merge map-side, and re-keying (hour → day rollup) is another max()
    merge of the same registers, never a re-scan.  The standard shape for
    "distinct users per window/host/label" dashboards over unbounded
    logs."""
    rows = df.select(F.col(key_col).alias("key"), *_init_reg_cols(F.col(col), seed))
    regs = rows.groupBy("key").agg(
        *[F.max(r).alias(r) for r in _REGS],
        F.count(F.lit(1)).alias("_n"),
    )
    return regs.select(
        "key",
        F.round(_estimate_col(), 6).alias("est"),
        F.col("_n").alias("n_rows"),
    )


def small_world_sigma(
    curve: DataFrame, gcc: float, n: int, mean_k: float
) -> DataFrame:
    """One row (clustering, avg_path, c_rand, l_rand, sigma) — the
    small-world coefficient σ = (C/C_rand)/(L/L_rand) (Humphries &
    Gurney, PLoS ONE 2008): σ » 1 is the Watts–Strogatz signature real
    web graphs show (high clustering AND short paths).

    ``curve``: a 6dp-ROUNDED (h, nf) neighborhood function from
    :func:`hyper_anf` — L falls out as the probability-mass-weighted mean
    hop Σ h·(nf(h)−nf(h−1)) / (nf(max)−nf(0)), over reached non-self
    pairs.  ``gcc`` = 3·triangles/wedges, ``mean_k`` = 2m/n (scalar
    readouts, the caller's plan-build aggregates).  Random baselines:
    C_rand = ⟨k⟩/n, L_rand = ln n / ln⟨k⟩ (Erdős–Rényi at equal density).
    The lag window runs over the ≤ max_h+1-row curve — single-partition
    by construction, not a scale hazard."""
    import math

    from pyspark.sql import Window

    c_rand = mean_k / n
    l_rand = math.log(n) / math.log(mean_k)
    w = Window.orderBy("h")
    d = curve.withColumn("prev", F.lag("nf").over(w)).filter(
        F.col("prev").isNotNull()
    )
    agg = d.agg(
        F.sum(F.col("h") * (F.col("nf") - F.col("prev"))).alias("num"),
        F.sum(F.col("nf") - F.col("prev")).alias("den"),
    )
    lcol = F.col("num") / F.col("den")
    return agg.select(
        F.round(F.lit(gcc), 6).alias("clustering"),
        F.round(lcol, 6).alias("avg_path"),
        F.round(F.lit(c_rand), 6).alias("c_rand"),
        F.round(F.lit(l_rand), 6).alias("l_rand"),
        F.round(
            (F.lit(gcc) / F.lit(c_rand)) / (lcol / F.lit(l_rand)), 6
        ).alias("sigma"),
    )
