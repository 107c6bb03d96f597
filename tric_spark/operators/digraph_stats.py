"""Directed-link-graph structure statistics: link reciprocity and degree
assortativity — the two standard one-pass diagnostics a web-graph study
reports alongside degree distributions (reference computes the analogous
per-graph summary in graph.hpp:271-305's dist-stats sink; these extend it
to the directed corpus graph).

Both are pure DataFrame aggregates: one self-join (semi) for reciprocity,
two degree joins + a Pearson ``corr`` for assortativity. No Python, no
driver loops; every number is rounded 6dp so the DuckDB oracle replays it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _clean_directed(directed: DataFrame) -> DataFrame:
    """Distinct non-loop directed edges — the universe both metrics use."""
    return (
        directed.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def reciprocal_pairs(directed: DataFrame) -> DataFrame:
    """(src, dst) with src < dst — unordered pairs linked in BOTH
    directions. Left-semi against the reversed edge set, then the src<dst
    filter emits each mutual pair exactly once."""
    e = _clean_directed(directed)
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return (
        e.join(rev, ["src", "dst"], "left_semi")
        .filter(F.col("src") < F.col("dst"))
    )


def reciprocity(directed: DataFrame) -> DataFrame:
    """One row (n_edges, n_reciprocal, reciprocity): reciprocity is the
    fraction of distinct non-loop directed edges whose reverse also exists
    (2·|mutual pairs| / |edges|) — the standard digraph reciprocity
    coefficient."""
    e = _clean_directed(directed).cache()
    n = e.count()
    mutual = reciprocal_pairs(e).agg(F.count(F.lit(1)).alias("m"))
    return mutual.select(
        F.lit(n).alias("n_edges"),
        (F.col("m") * 2).alias("n_reciprocal"),
        F.round((F.col("m") * 2) / F.lit(max(n, 1)), 6).alias("reciprocity"),
    )


def degree_assortativity(sym_edges: DataFrame, degrees: DataFrame) -> DataFrame:
    """One row (assortativity): Pearson correlation between the endpoint
    degrees over every directed representation of an undirected edge
    (``sym_edges`` carries both directions, so each edge contributes both
    orderings — the Newman 2002 definition). Sample-vs-population
    normalization cancels inside a correlation, so Spark's ``corr`` and
    DuckDB's ``corr`` agree bit-for-bit at 6dp."""
    du = degrees.select(F.col("vid").alias("src"), F.col("degree").alias("du"))
    dv = degrees.select(F.col("vid").alias("dst"), F.col("degree").alias("dv"))
    return (
        sym_edges.join(du, "src")
        .join(dv, "dst")
        .agg(F.round(F.corr("du", "dv"), 6).alias("assortativity"))
    )


def powerlaw_alpha(degrees: DataFrame, d_min: int = 2) -> DataFrame:
    """One row (alpha, sigma, n_tail, d_min) — the continuous-MLE power-law
    exponent of the degree distribution (Clauset, Shalizi & Newman, SIAM
    Rev. 51(4), 2009 eq. 3.1): α = 1 + n / Σ ln(d_i / (d_min − ½)) over the
    tail d_i ≥ d_min, with standard error σ = (α−1)/√n. THE number every
    web-graph measurement paper reports (the web's in-degree exponent
    ≈ 2.1, Broder et al. 2000); the ½-shift is the standard discrete-data
    correction. One filter + one aggregate — no sort, no collect; 6dp."""
    tail = degrees.select(F.col("degree").cast("double").alias("d")).filter(
        F.col("d") >= float(d_min)
    )
    agg = tail.agg(
        F.count(F.lit(1)).alias("n_tail"),
        F.sum(F.log(F.col("d") / (float(d_min) - 0.5))).alias("_s"),
    )
    return agg.select(
        F.round(F.lit(1.0) + F.col("n_tail") / F.col("_s"), 6).alias("alpha"),
        F.round(
            (F.col("n_tail") / F.col("_s")) / F.sqrt(F.col("n_tail")), 6
        ).alias("sigma"),
        F.col("n_tail").cast("long").alias("n_tail"),
        F.lit(d_min).cast("long").alias("d_min"),
    )


def rich_club(canon_edges: DataFrame, degrees: DataFrame) -> DataFrame:
    """(k, n_rich, e_rich, phi) — the rich-club curve φ(k) = 2·E_k /
    (N_k·(N_k−1)) over every threshold k in the degree distribution, where
    N_k counts vertices of degree > k and E_k the edges between them.

    Zhou & Mondragón (IEEE Comm. Lett. 8(3), 2004): do the hubs of the web
    graph link to EACH OTHER more than chance — the link-farm / oligarchy
    diagnostic next to assortativity.

    Scale shape: the threshold set is the DISTINCT degree values — a tiny
    frame (≤ max-degree rows, Zipf-bounded in practice) that broadcasts.
    Each edge carries min(deg(src), deg(dst)) after two degree joins; a
    broadcast theta-join on min_deg > k + one groupBy(k) counts E_k, and
    the same shape over the degree table counts N_k. No pair enumeration
    anywhere — the curve costs two scans of the edge list. Rows with
    N_k < 2 keep phi NULL (the coefficient is undefined there).
    """
    d = degrees.select("vid", "degree")
    ks = degrees.select(F.col("degree").alias("k")).distinct()
    emin = (
        canon_edges.join(
            d.withColumnsRenamed({"vid": "src", "degree": "sdeg"}), "src"
        )
        .join(d.withColumnsRenamed({"vid": "dst", "degree": "ddeg"}), "dst")
        .select(F.least("sdeg", "ddeg").alias("min_deg"))
    )
    e_rich = (
        emin.join(F.broadcast(ks), F.col("min_deg") > F.col("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("e_rich"))
    )
    n_rich = (
        d.join(F.broadcast(ks), F.col("degree") > F.col("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_rich"))
    )
    # left-join from the full threshold set: the top threshold(s) have an
    # EMPTY rich club (n_rich = 0, phi undefined) and must still appear
    return (
        ks.join(n_rich, "k", "left")
        .join(e_rich, "k", "left")
        .select(
            "k",
            F.coalesce("n_rich", F.lit(0)).alias("n_rich"),
            F.coalesce("e_rich", F.lit(0)).alias("e_rich"),
            F.when(
                F.col("n_rich") >= 2,
                F.round(
                    2.0 * F.coalesce("e_rich", F.lit(0))
                    / (F.col("n_rich") * (F.col("n_rich") - 1)),
                    6,
                ),
            ).alias("phi"),
        )
    )


def attribute_assortativity(sym_edges: DataFrame, labels: DataFrame) -> DataFrame:
    """One row (same_frac, expected, assortativity): categorical
    (attribute) assortativity — Newman 2003 eq. 2,

        r = (q − e) / (1 − e)

    where q = fraction of edges whose endpoints share the label and
    e = Σ_l a_l·b_l the same fraction expected if edges were rewired
    preserving the label mix of edge ENDPOINTS (a_l = b_l on an
    undirected graph: the degree-weighted label share). The homophily
    readout for web corpora: do pages link within their own language/
    host/topic? r = 1 is perfect mixing by label, 0 is random, < 0
    disassortative.

    ``sym_edges`` carries both orientations; ``labels`` is (vid, label)
    TOTAL over the graph's vertices. Shape: two vid joins (the modularity
    pattern) + three 1-row broadcast aggregates; endpoint shares come
    from ONE groupBy over the sym rows (each undirected edge contributes
    each endpoint once as src)."""
    la = labels.select(F.col("vid").alias("src"), F.col("label").alias("_la"))
    lb = labels.select(F.col("vid").alias("dst"), F.col("label").alias("_lb"))
    e = sym_edges.select("src", "dst").join(la, "src").join(lb, "dst")
    q = e.agg(
        F.avg((F.col("_la") == F.col("_lb")).cast("double")).alias("_q")
    )
    shares = (
        e.groupBy("_la")
        .agg(F.count(F.lit(1)).alias("_c"))
        .agg(
            (
                F.sum(F.col("_c") * F.col("_c"))
                / (F.sum("_c") * F.sum("_c"))
            ).alias("_e")
        )
    )
    return q.crossJoin(F.broadcast(shares)).select(
        F.round("_q", 6).alias("same_frac"),
        F.round("_e", 6).alias("expected"),
        # single-label graphs have e = 1: r is undefined (NULL), and the
        # guard keeps ANSI mode from throwing on the 0 divisor
        F.when(
            F.col("_e") < 1.0,
            F.round((F.col("_q") - F.col("_e")) / (1 - F.col("_e")), 6),
        ).alias("assortativity"),
    )


def triangle_null_ratio(canon_edges: DataFrame, degrees: DataFrame) -> DataFrame:
    """One row (tc_actual, tc_null, ratio): the measured triangle count
    against its configuration-model expectation
    E[T] ≈ (Σ d(d−1) / 2m)³ / 6 (Newman, SIAM Rev. 45(2) 2003 §IV.B —
    the standard null that preserves the degree sequence).  ratio » 1 is
    the transitivity excess real social/web graphs show over random
    rewiring; the reference reports raw counts only (main.cpp:248-261),
    this adds the normalized readout.  One exact TC kernel run + two
    scalar aggregates; 6dp."""
    from tric_spark.operators.tc import triangle_count_join

    tri = triangle_count_join(canon_edges)
    m = canon_edges.count()
    mom = degrees.agg(
        F.sum(F.col("degree") * (F.col("degree") - 1.0)).alias("s")
    )
    return mom.select(
        F.lit(int(tri)).cast("long").alias("tc_actual"),
        F.round(F.pow(F.col("s") / (2.0 * m), 3) / 6.0, 6).alias("tc_null"),
        F.round(
            F.lit(float(tri)) / (F.pow(F.col("s") / (2.0 * m), 3) / 6.0), 6
        ).alias("ratio"),
    )


def degree_pair_histogram(
    sym_edges: DataFrame, degrees: DataFrame
) -> DataFrame:
    """(bucket_src, bucket_dst, n_edges) — the joint degree-degree
    distribution over directed edge endpoints in log2 buckets (bucket =
    bit_length(degree)−1, an EXACT integer — no floating log at power-of-
    two boundaries).  The 2-D view behind the scalar assortativity:
    hub→hub vs hub→leaf mixing at a glance.  Two broadcast-sized joins
    against the degree table + one groupBy."""
    b = (F.length(F.bin(F.col("degree"))) - 1).alias("b")
    du = degrees.select(F.col("vid").alias("src"), b.alias("bucket_src"))
    dv = degrees.select(F.col("vid").alias("dst"), b.alias("bucket_dst"))
    return (
        sym_edges.join(du, "src")
        .join(dv, "dst")
        .groupBy("bucket_src", "bucket_dst")
        .agg(F.count(F.lit(1)).alias("n_edges"))
    )


def gini_coefficient(df: DataFrame, col: str) -> DataFrame:
    """One row (n, total, gini) — the exact Gini concentration index of a
    nonnegative numeric column, computed SORT-FREE from the value
    histogram: with tied values occupying consecutive ranks,
    Σ rank·x = Σ_v v·(c_v·cb_v + c_v(c_v+1)/2) (cb = count of smaller
    values), and G = 2·Σrank·x/(n·Σx) − (n+1)/n.  Everything up to the
    final division is INTEGER arithmetic for integer inputs — no float
    ordering anywhere, bit-identical across engines.  The inequality
    readout for web graphs (degree/traffic concentration: G ≈ 0.6–0.9
    on real link graphs) and corpus budgets (tokens per host).

    Scale shape: one groupBy(value) + a cumulative window over the VALUE
    histogram (cardinality = distinct values, the exact_quantiles trade)
    + one scalar fold."""
    counts = df.select(F.col(col).alias("v")).groupBy("v").agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    cb = counts.select(
        "v", "c", F.coalesce(F.sum("c").over(w), F.lit(0)).alias("cb")
    )
    agg = cb.agg(
        F.sum("c").alias("n"),
        F.sum(F.col("v") * F.col("c")).alias("sx"),
        F.sum(
            F.col("v")
            * (
                F.col("c") * F.col("cb")
                + F.col("c") * (F.col("c") + 1) / 2
            )
        ).alias("s1"),
    )
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.col("sx").cast("double").alias("total"),
        F.round(
            2.0 * F.col("s1") / (F.col("n") * F.col("sx"))
            - (F.col("n") + 1.0) / F.col("n"),
            6,
        ).alias("gini"),
    )


def neighbor_degree_curve(
    sym_edges: DataFrame, degrees: DataFrame
) -> DataFrame:
    """(degree, n_vertices, knn) — the average-neighbor-degree curve
    knn(k) (Pastor-Satorras, Vázquez & Vespignani PRL 2001): per vertex,
    mean degree of its neighbors; averaged over all degree-k vertices.
    Decreasing knn(k) = disassortative (the web's signature — hubs link
    to leaves); the curve form of the scalar assortativity.  Two joins
    against the degree table + two groupBys, 6dp."""
    dv = degrees.select(F.col("vid").alias("dst"), F.col("degree").alias("dd"))
    per_v = (
        sym_edges.join(dv, "dst")
        .groupBy(F.col("src").alias("vid"))
        .agg(F.sum("dd").alias("sd"), F.count(F.lit(1)).alias("d"))
        .select("vid", (F.col("sd") / F.col("d")).alias("and_v"))
    )
    return (
        per_v.join(degrees, "vid")
        .groupBy("degree")
        .agg(
            F.count(F.lit(1)).alias("n_vertices"),
            F.round(F.avg("and_v"), 6).alias("knn"),
        )
    )


def degree_ccdf(degrees: DataFrame) -> DataFrame:
    """(degree, n_ge, ccdf) — the complementary cumulative degree
    distribution P(D ≥ k): THE log-log plot behind every power-law claim
    (CCDFs avoid the binning noise of raw histograms — Clauset et al.
    2009 §3).  One histogram groupBy + one cumulative window over the
    VALUE histogram (cardinality = distinct degrees), 6dp."""
    counts = degrees.groupBy("degree").agg(F.count(F.lit(1)).alias("c"))
    w = Window.orderBy(F.col("degree").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot = degrees.agg(F.count(F.lit(1)).alias("n"))
    return (
        counts.select("degree", F.sum("c").over(w).alias("n_ge"))
        .crossJoin(F.broadcast(tot))
        .select(
            "degree",
            "n_ge",
            F.round(F.col("n_ge") / F.col("n"), 6).alias("ccdf"),
        )
    )
