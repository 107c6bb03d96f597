"""Deterministic synthetic Common-Crawl-style pages + link graph (FIXTURES §1–2).

The reference ships a synthetic RGG generator driven by a reproducible
parallel LCG (graph.hpp:626–1258, utils.hpp:200–385) so any rank count
produces the same graph. Our analog: every column is a pure expression of
``(seed, row_id)`` via ``xxhash64`` — no RNG state, no sequential
dependency, so the same table materializes identically at any parallelism
(the property the LCG's matrix-power prefix scheme buys; SURVEY §2.1 maps
it to exactly this).

Everything is built with JVM-side column expressions (`sequence`,
`transform`, `filter`, `concat`) — zero Python in the generator, so synth
at bench scale runs at whole-stage-codegen speed.

The out-degree law is a truncated power law (hub vertices guaranteed) so
skew handling is actually exercised (FIXTURES §2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

VOCAB = (
    "link graph web page crawl rank spark node edge hub index query data "
    "count join scan merge sort hash part"
).split()


def _degree_col(h2: Column, n: int) -> Column:
    """Truncated Zipf out-degree: u ∈ (0,1], deg = min(cap, 1 + floor(2/u))
    → P(deg > D) ≈ 2/D (power-law tail, exponent 2), mean ≈ 2·ln(1000) ≈ 15,
    hubs up to min(n/10, 2001) — web-graph-shaped skew at every scale."""
    u = (F.pmod(h2, F.lit(1000)) + 1) / F.lit(1000.0)
    cap = max(2, n // 10)
    return F.least(F.lit(cap), (F.lit(1) + F.floor(F.lit(2.0) / u))).cast("int")


def _url_of(vid: Column, seed: int) -> Column:
    h = F.xxhash64(F.lit(seed), vid)
    return F.concat(
        F.lit("https://site"),
        F.pmod(h, F.lit(1000)).cast("string"),
        F.lit(".example/p/"),
        vid.cast("string"),
    )


def _out_targets(vid: Column, h1: Column, deg: Column, n: int) -> Column:
    """Deterministic outlink target ids: (i*37 + j² + h1%7) % n for
    j in 1..deg, minus self-loops, deduped (FIXTURES §2)."""
    raw = F.transform(
        F.sequence(F.lit(1), deg),
        lambda j: F.pmod(vid * 37 + j * j + F.pmod(h1, F.lit(7)), F.lit(n)),
    )
    return F.array_distinct(F.filter(raw, lambda d: d != vid))


def pages_table(spark: SparkSession, n_pages: int, seed: int = 42) -> DataFrame:
    """(url, warc_ts, html, text, lang) — the north-rule input shape.

    ``text`` is constructed to be exactly what the pinned extractor
    (tric_spark.extract.extract_text) produces from ``html`` — the
    byte-identity tests assert it.
    """
    n = n_pages
    df = spark.range(n).withColumnRenamed("id", "vid")
    h1 = F.xxhash64(F.lit(seed), F.col("vid"))
    h2 = F.xxhash64(F.lit(seed + 1), F.col("vid"))
    deg = _degree_col(h2, n)

    vocab = F.array(*[F.lit(w) for w in VOCAB])
    nv = len(VOCAB)
    word = lambda k: F.element_at(vocab, (F.pmod(F.xxhash64(F.lit(seed + 10 + k), F.col("vid")), F.lit(nv)) + 1).cast("int"))
    body = F.concat_ws(" ", F.lit("page"), F.col("vid").cast("string"), F.lit("about"), word(0), word(1), word(2), word(3))

    targets = _out_targets(F.col("vid"), h1, deg, n)
    anchors = F.array_join(
        F.transform(
            targets,
            lambda d: F.concat(F.lit('<a href="'), _url_of(d, seed), F.lit('">l</a>')),
        ),
        "",
    )
    title = F.concat(F.lit("t"), F.col("vid").cast("string"))
    html_str = F.concat(
        F.lit("<html><head><title>"), title, F.lit("</title></head><body><p>"),
        body, F.lit("</p>"), anchors, F.lit("</body></html>"),
    )
    text = F.concat(title, F.lit("\n"), body)

    return df.select(
        F.col("vid"),
        _url_of(F.col("vid"), seed).alias("url"),
        F.to_timestamp(
            F.from_unixtime(F.lit(1735689600) + F.pmod(h1, F.lit(31536000)))
        ).alias("warc_ts"),
        html_str.cast("binary").alias("html"),
        text.alias("text"),
        F.element_at(
            F.array(F.lit("en"), F.lit("de"), F.lit("fr"), F.lit("es")),
            (F.pmod(h1, F.lit(4)) + 1).cast("int"),
        ).alias("lang"),
    )


def link_edges(spark: SparkSession, n_pages: int, seed: int = 42) -> DataFrame:
    """Directed (src, dst) edge table — the same graph the pages' anchors
    encode, generated directly in id space (bypasses html parsing; used by
    benchmarks and as the ground truth the extraction path must reproduce)."""
    n = n_pages
    df = spark.range(n).withColumnRenamed("id", "vid")
    h1 = F.xxhash64(F.lit(seed), F.col("vid"))
    h2 = F.xxhash64(F.lit(seed + 1), F.col("vid"))
    deg = _degree_col(h2, n)
    targets = _out_targets(F.col("vid"), h1, deg, n)
    return df.select(
        F.col("vid").alias("src"), F.explode(targets).alias("dst")
    )


# ---------------------------------------------------------------------------
# True RGG source (reference GenerateRGG, graph.hpp:626-1258)
# ---------------------------------------------------------------------------


def rgg_default_radius(n: int) -> float:
    """The reference's connectivity radius rn_ = (rc + rt)/2 with
    rc = sqrt(ln n / (pi n)), rt = sqrt(2.0736 / n) (graph.hpp:670-672)."""
    import math

    return (math.sqrt(math.log(n) / (math.pi * n)) + math.sqrt(2.0736 / n)) / 2.0


def rgg_points(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """(vid, x, y) — n points in the unit square; coordinates are pure
    functions of (seed, vid) (the LCG-analog determinism invariant: same
    table at any parallelism). 30-bit resolution keeps the doubles exact."""
    df = spark.range(n).withColumnRenamed("id", "vid")

    def u(k: int) -> Column:
        return F.pmod(F.xxhash64(F.lit(seed + k), F.col("vid")), F.lit(1 << 30)) / F.lit(
            float(1 << 30)
        )

    return df.select("vid", u(100).alias("x"), u(101).alias("y"))


def rgg_edges(
    spark: SparkSession,
    n: int,
    radius: float | None = None,
    extra_edge_pct: float = 0.0,
    seed: int = 42,
    unit_weight: bool = True,
) -> DataFrame:
    """Canonical (src, dst, weight) RGG edge table, src < dst.

    Reference semantics (GenerateRGG::generate, graph.hpp:684-1164): points
    in the unit square, an edge where squared Euclidean distance ≤ radius²
    (the `ed <= rn_` predicate, graph.hpp:803-808, compared square-vs-square
    here so Spark and the numpy oracle agree bit-for-bit), weight = the
    distance (or 1.0 with ``unit_weight``, the -w flag), plus
    ``extra_edge_pct``% of n uniformly random extra edges with weights in
    the OPEN interval (0,1) like the reference's unif(0,1) draw (the -p
    flag, graph.hpp:978-1164; the hash is mapped (h+1)/(2³⁰+1) so 0.0 is
    unreachable). Self-loop/duplicate collisions shrink the extra-edge
    count slightly below the requested pct without re-draw — a documented
    divergence from GenerateRGG, which retries.

    Scale shape: the reference compares each strip only against its up/down
    ghost neighbors (1-D decomposition); the Spark analog is the standard
    2-D grid-cell equi-join — each point joins only its own and 8 adjacent
    radius-sized cells, one shuffle on the cell key, never an all-pairs
    product.
    """
    r = rgg_default_radius(n) if radius is None else radius
    pts = rgg_points(spark, n, seed)

    def cell(c: Column) -> Column:
        return F.floor(c / F.lit(r)).cast("long")

    a = pts.select(
        F.col("vid").alias("a"), F.col("x").alias("ax"), F.col("y").alias("ay"),
        cell(F.col("x")).alias("cx"), cell(F.col("y")).alias("cy"),
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    b = (
        pts.select(
            F.col("vid").alias("b"), F.col("x").alias("bx"), F.col("y").alias("by"),
            cell(F.col("x")).alias("bcx"), cell(F.col("y")).alias("bcy"),
            F.explode(offsets).alias("o"),
        )
        .select(
            "b", "bx", "by",
            (F.col("bcx") + F.col("o.dx")).alias("cx"),
            (F.col("bcy") + F.col("o.dy")).alias("cy"),
        )
    )
    d2 = (F.col("ax") - F.col("bx")) ** 2 + (F.col("ay") - F.col("by")) ** 2
    w = F.lit(1.0) if unit_weight else F.sqrt(d2)
    geo = (
        a.join(b, ["cx", "cy"])
        .filter((F.col("a") < F.col("b")) & (d2 <= F.lit(r * r)))
        .select(F.col("a").alias("src"), F.col("b").alias("dst"), w.alias("weight"))
    )
    if extra_edge_pct <= 0.0:
        return geo
    k = int(extra_edge_pct * n / 100.0)
    ridx = spark.range(k)
    rnd = ridx.select(
        F.pmod(F.xxhash64(F.lit(seed + 200), "id"), F.lit(n)).alias("u"),
        F.pmod(F.xxhash64(F.lit(seed + 201), "id"), F.lit(n)).alias("v"),
        (
            (F.pmod(F.xxhash64(F.lit(seed + 202), "id"), F.lit(1 << 30)) + F.lit(1))
            / F.lit(float((1 << 30) + 1))
        ).alias("weight"),
    )
    rnd = (
        rnd.filter(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("src"), F.greatest("u", "v").alias("dst"), "weight"
        )
        .join(geo.select("src", "dst"), ["src", "dst"], "left_anti")
        .dropDuplicates(["src", "dst"])
    )
    return geo.union(rnd)


def rmat_edges(
    spark: SparkSession,
    n_edges: int,
    scale: int = 16,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    seed: int = 42,
) -> DataFrame:
    """(src, dst) — R-MAT/Kronecker directed edges over 2^scale vertices
    (Chakrabarti, Zhan & Faloutsos SDM'04; a/b/c defaults are the
    Graph500 parameters, d = 1−a−b−c = 0.05): per edge, ``scale``
    recursive quadrant choices, each from one deterministic md5 uniform
    keyed ("rmat", seed, edge index, level) — the engine-wide seedless-
    randomness rule, so the edge set is identical at any parallelism and
    replayable in python/SQL. Multi-edges and self-loops are emitted raw,
    exactly as the generator family does — graph.canonical_edges is the
    dedup stage downstream.

    The hub skew this generator exists for (heavy-tailed in/out degrees —
    the web-graph stress shape for the TC hub-split and AQE skew paths)
    comes from a ≫ d; the whole build is spark.range + unrolled JVM
    expressions: no Python, no shuffle, embarrassingly parallel."""
    if not 0 < a + b + c < 1:
        raise ValueError("need 0 < a+b+c < 1 (d = 1-a-b-c must be positive)")
    e = spark.range(int(n_edges)).select(F.col("id").alias("_i"))
    # one md5 yields five 24-bit uniforms (6 hex digits each) — 5 levels
    # per hash call instead of 1; hashing dominates the generator cost
    n_groups = (scale + 4) // 5
    groups = [
        F.md5(
            F.concat_ws(
                ":",
                F.lit("rmat"),
                F.lit(str(seed)),
                F.col("_i").cast("string"),
                F.lit(str(g)),
            )
        )
        for g in range(n_groups)
    ]
    src = F.lit(0).cast("long")
    dst = F.lit(0).cast("long")
    for lvl in range(scale):
        h = groups[lvl // 5]
        u = (
            F.conv(F.substring(h, 1 + 6 * (lvl % 5), 6), 16, 10).cast("double")
            / F.lit(float(16**6))
        )
        src_bit = (u >= F.lit(a + b)).cast("long")
        dst_bit = (
            ((u >= F.lit(a)) & (u < F.lit(a + b)))
            | (u >= F.lit(a + b + c))
        ).cast("long")
        src = src + F.shiftleft(src_bit, lvl)
        dst = dst + F.shiftleft(dst_bit, lvl)
    return e.select(src.alias("src"), dst.alias("dst"))


def sbm_edges(
    spark: SparkSession,
    n: int,
    k: int = 4,
    d_in: int = 8,
    d_out: int = 2,
    seed: int = 42,
) -> DataFrame:
    """(src, dst, block) — planted-partition (symmetric SBM) directed
    picks over ``n`` vertices in ``k`` equal blocks (block(v) = v % k;
    ``n`` must be divisible by ``k``): per vertex, ``d_in`` intra-block
    and ``d_out`` inter-block targets, every choice one deterministic
    md5 uniform keyed ("sbm", seed, v, tag, j) — the engine-wide
    seedless-randomness rule (identical at any parallelism, replayable in
    python).  Multi-edges are emitted raw; self-loops are impossible by
    construction (the intra member index skips the vertex's own slot).

    The community-detection eval fixture: generate with d_in ≫ d_out,
    cluster (louvain/lp), score against the planted ``block`` column with
    operators/clustereval.cluster_agreement.  Like rmat_edges, the whole
    build is spark.range + JVM expressions — no Python, no shuffle.
    """
    if n % k != 0:
        raise ValueError("n must be divisible by k (equal blocks)")
    if k < 2 or n // k < 2:
        raise ValueError("need k >= 2 blocks of >= 2 vertices")
    bs = n // k  # block size

    def u48(tag: str, j: int) -> Column:
        h = F.md5(
            F.concat_ws(
                ":",
                F.lit("sbm"),
                F.lit(str(seed)),
                F.col("id").cast("string"),
                F.lit(tag),
                F.lit(str(j)),
            )
        )
        return F.conv(F.substring(h, 1, 12), 16, 10).cast("long")

    v = spark.range(n)
    blk = F.col("id") % k
    own = (F.col("id") / k).cast("long")  # the vertex's member index
    targets = []
    for j in range(d_in):
        # member index in 0..bs-1, own slot excluded -> no self-loops
        m = (own + 1 + u48("in", j) % (bs - 1)) % bs
        targets.append(blk + k * m)
    for j in range(d_out):
        r = 1 + u48("blk", j) % (k - 1)  # a DIFFERENT block
        m = u48("out", j) % bs
        targets.append((blk + r) % k + k * m)
    arr = F.array(*targets)
    return v.select(
        F.col("id").alias("src"),
        F.explode(arr).alias("dst"),
        blk.alias("block"),
    )
