"""Neighborhood-overlap link prediction over the undirected link graph.
[north-rule family: standard link-graph analytics beyond the reference's
TC focus]

Three classic similarity indices for "should/will these two pages be
linked" (the web-graph link-prediction toolbox; Liben-Nowell & Kleinberg
CIKM'03 is the canonical survey):

- common neighbors  CN(a,b) = |N(a) ∩ N(b)|
- Adamic–Adar       AA(a,b) = Σ_{z ∈ N(a)∩N(b)} 1/ln(deg(z))
  (Adamic & Adar, Social Networks 25(3), 2003 — rare shared neighbors
  count more than directory-page hubs)
- resource allocation RA(a,b) = Σ_{z} 1/deg(z)
  (Zhou, Lü & Zhang, Eur. Phys. J. B 71, 2009 — the stronger degree
  penalty)

All three fall out of ONE wedge plan — the same self-join-through-a-pivot
shape as the TC kernels and cocitation.py, with the pivot being the shared
neighbor z: join the symmetric edge list to itself on z, keep a < b, and
aggregate count / Σ1/ln(deg) / Σ1/deg in a single map-side-combined
groupBy. A wedge pivot necessarily has deg(z) ≥ 2, so ln(deg(z)) ≥ ln 2 —
the divisions are total by construction.

Scale shape: a pivot of degree d emits C(d,2) pairs — the standard
quadratic hub hazard — so the library-wide safe-by-default fan-out guard
applies (pivots above ``max_fanout`` are excluded; ``None`` opts out).
That exclusion is also the semantically right call for AA/RA: the guard
only drops pivots whose per-wedge contribution is ≤ 1/ln(max_fanout) ≈
0.087 — precisely the neighbors these indices exist to discount.
``min_common`` prunes the long tail inside the aggregate; AA/RA are
ROUNDED to 6dp (ln is not bit-identical across engines — the
crawl-frontier lesson applied to values rather than ranks).

Reference analog: none (tric is TC-only); the wedge plan cites
tric.hpp:132–177 for the shared join shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tric_spark.operators.cocitation import DEFAULT_MAX_FANOUT


def link_prediction_scores(
    sym_edges: DataFrame,
    min_common: int = 1,
    max_fanout: int | None = DEFAULT_MAX_FANOUT,
    exclude_existing: bool = False,
) -> DataFrame:
    """(a, b, common, aa, ra) with a < b — neighborhood-overlap scores for
    every pair sharing ≥ ``min_common`` neighbors. ``sym_edges`` is the
    symmetrized deduped (src, dst) graph (both directions present, as
    graph.symmetrize emits). ``exclude_existing=True`` anti-joins pairs
    that are already edges — the link-PREDICTION view (score only absent
    links); the default keeps them (the related-pages / similarity view).
    """
    deg = sym_edges.groupBy(F.col("src").alias("z")).agg(
        F.count("*").alias("dz")
    )
    if max_fanout is not None:
        deg = deg.filter(F.col("dz") <= max_fanout)
    # (z, leaf, dz): each undirected edge once per direction; the pivot z
    # carries its degree into the wedge so the aggregate needs no re-join
    ez = sym_edges.select(F.col("dst").alias("z"), F.col("src").alias("leaf")).join(
        deg, "z"
    )
    l = ez.select("z", F.col("leaf").alias("a"), "dz")
    r = ez.select("z", F.col("leaf").alias("b"))
    scores = (
        l.join(r, "z")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(
            F.count("*").alias("common"),
            F.round(F.sum(F.lit(1.0) / F.log("dz")), 6).alias("aa"),
            F.round(F.sum(F.lit(1.0) / F.col("dz")), 6).alias("ra"),
        )
        .filter(F.col("common") >= min_common)
    )
    if exclude_existing:
        und = sym_edges.filter(F.col("src") < F.col("dst")).select(
            F.col("src").alias("a"), F.col("dst").alias("b")
        )
        scores = scores.join(und, ["a", "b"], "left_anti")
    return scores


def jaccard_scores(
    sym_edges: DataFrame,
    min_common: int = 1,
    max_fanout: int | None = DEFAULT_MAX_FANOUT,
) -> DataFrame:
    """(a, b, common, jaccard, cosine, pa) with a < b — the normalized
    overlap indices from the same survey (Liben-Nowell & Kleinberg
    CIKM'03): Jaccard = |N(a)∩N(b)| / |N(a)∪N(b)|, cosine (Salton) =
    common / √(deg·deg), preferential attachment pa = deg(a)·deg(b).

    One extra pair of degree joins on top of the shared wedge plan; the
    denominators use the TRUE degrees (the fan-out guard only bounds
    which pivots may contribute to ``common`` — hub membership in N(a)
    still counts toward the union size)."""
    pairs = link_prediction_scores(sym_edges, min_common, max_fanout).select(
        "a", "b", "common"
    )
    deg = sym_edges.groupBy(F.col("src").alias("vid")).agg(
        F.count("*").alias("d")
    )
    return (
        pairs.join(deg.withColumnsRenamed({"vid": "a", "d": "da"}), "a")
        .join(deg.withColumnsRenamed({"vid": "b", "d": "db"}), "b")
        .select(
            "a",
            "b",
            "common",
            F.round(
                F.col("common") / (F.col("da") + F.col("db") - F.col("common")),
                6,
            ).alias("jaccard"),
            F.round(
                F.col("common") / F.sqrt(F.col("da") * F.col("db")), 6
            ).alias("cosine"),
            (F.col("da") * F.col("db")).alias("pa"),
        )
    )


def predicted_links_topk(
    sym_edges: DataFrame,
    k: int = 10,
    min_common: int = 2,
    max_fanout: int | None = DEFAULT_MAX_FANOUT,
) -> DataFrame:
    """(vid, candidate, aa, rnk) — each page's top-k predicted NEW links by
    Adamic–Adar (existing edges excluded; ties broken by candidate id).
    The per-vid window sort is bounded by the fan-out guard upstream, the
    same argument as related_pages_topk."""
    from pyspark.sql import Window

    pairs = link_prediction_scores(
        sym_edges, min_common, max_fanout, exclude_existing=True
    )
    both = pairs.select(
        F.col("a").alias("vid"), F.col("b").alias("candidate"), "aa"
    ).union(
        pairs.select(F.col("b").alias("vid"), F.col("a").alias("candidate"), "aa")
    )
    w = Window.partitionBy("vid").orderBy(F.desc("aa"), F.asc("candidate"))
    return both.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)
