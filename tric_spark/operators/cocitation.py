"""Co-citation and bibliographic coupling over the directed link graph.
[north-rule family: standard link-graph analytics beyond the reference's
TC focus]

Two classic related-page measures (Small 1973; Kessler 1963), both one
self-join + one groupBy — the wedge plan from the TC kernels applied to a
direction-preserving graph:

- co-citation(v, w)   = |{u : u→v and u→w}|  (pages CITED TOGETHER —
  wedges through a common SOURCE)
- coupling(v, w)      = |{x : v→x and w→x}|  (pages CITING THE SAME
  THINGS — wedges through a common TARGET)

Scale shape: a source with out-degree d emits C(d,2) co-citation pairs —
the same quadratic hub hazard as the LSH band buckets, so the same
safe-by-default guard applies: sources (resp. targets) with fan-out above
``max_fanout`` are EXCLUDED from pair generation (``None`` opts out, the
library-wide convention from operators.dedup). A super-hub directory page
linking 10^6 targets would otherwise emit 5·10^11 pairs by itself while
contributing nothing to "these two pages are related" (its co-citations
are noise precisely because it cites everything). The groupBy then bounds
output to pairs that actually co-occur; ``min_common`` prunes the long
tail before it leaves the aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_MAX_FANOUT = 100_000


def _wedge_pairs(
    edges: DataFrame,
    pivot: str,
    leaf: str,
    max_fanout: int | None,
    min_common: int,
) -> DataFrame:
    """(a, b, common) with a < b: count of shared ``pivot`` endpoints
    between two distinct ``leaf`` endpoints."""
    e = edges.select(pivot, leaf)
    if max_fanout is not None:
        ok = (
            e.groupBy(pivot)
            .agg(F.count("*").alias("_d"))
            .filter(F.col("_d") <= max_fanout)
            .select(pivot)
        )
        e = e.join(ok, pivot, "left_semi")
    l = e.select(F.col(pivot).alias("_p"), F.col(leaf).alias("a"))
    r = e.select(F.col(pivot).alias("_p"), F.col(leaf).alias("b"))
    return (
        l.join(r, "_p")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("common"))
        .filter(F.col("common") >= min_common)
    )


def cocitation_pairs(
    directed: DataFrame,
    min_common: int = 1,
    max_fanout: int | None = DEFAULT_MAX_FANOUT,
) -> DataFrame:
    """(a, b, common) with a < b — pages co-cited by ≥ ``min_common``
    common sources. ``directed`` is the deduped (src, dst) link graph."""
    return _wedge_pairs(directed, "src", "dst", max_fanout, min_common)


def coupling_pairs(
    directed: DataFrame,
    min_common: int = 1,
    max_fanout: int | None = DEFAULT_MAX_FANOUT,
) -> DataFrame:
    """(a, b, common) with a < b — pages citing ≥ ``min_common`` common
    targets (bibliographic coupling)."""
    return _wedge_pairs(directed, "dst", "src", max_fanout, min_common)


def related_pages_topk(
    directed: DataFrame,
    k: int = 10,
    min_common: int = 2,
    max_fanout: int | None = DEFAULT_MAX_FANOUT,
) -> DataFrame:
    """(vid, related, common, rnk) — each page's top-k most co-cited pages
    (ties broken by the related page's id for determinism). The standard
    'related pages' feature built from :func:`cocitation_pairs`; two-phase
    top-k is unnecessary here because the window partitions by vid — the
    per-partition sort is bounded by each vid's candidate count, which the
    fan-out guard already bounds."""
    from pyspark.sql import Window

    pairs = cocitation_pairs(directed, min_common, max_fanout)
    both = pairs.select(
        F.col("a").alias("vid"), F.col("b").alias("related"), "common"
    ).union(
        pairs.select(F.col("b").alias("vid"), F.col("a").alias("related"), "common")
    )
    w = Window.partitionBy("vid").orderBy(F.desc("common"), F.asc("related"))
    return (
        both.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )
