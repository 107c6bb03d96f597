"""Clique-percolation (CPM, k=3) overlapping communities.

Palla et al.'s clique percolation method at k=3: two triangles are
adjacent when they share an edge; a community is a connected set of
triangles, and a vertex belongs to every community one of its triangles
reaches — so memberships OVERLAP, which is what distinguishes CPM from
the partition-style detectors (louvain.py, lp.py).  The reference has no
CPM kernel; this composes its triangle enumeration semantics
(tric.hpp:132-177 wedge+probe) with the hash-min component machinery
(cc.py), the same way its TC variants compose wedge generation with a
probe.

Spark shape (all stages bounded, no driver loops beyond the CC
supersteps):

1. enumerate triangles once with the id-oriented wedge join
   (``tc.triangles_join`` — one shuffle, semi-join probe);
2. key each triangle edge as ``src*key_factor + dst`` (int64; guarded —
   at >10^9-vertex scale use wider keys, see graph.py's 128-bit lore);
3. connect the three edge-keys of every triangle (the triangle-edge
   graph: |E'| = 3·|tri| before dedup) and run hash-min connected
   components over it — edges sharing a triangle percolate into one
   component;
4. decode each surviving edge-key back to its two endpoints and emit
   distinct (vid, community), community = the component's min edge-key.

Equivalent to CC over the "two triangles share an edge" adjacency: an
edge shared by two triangles is one vertex of the edge-graph, so both
triangles' edge-keys land in the same component.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tric_spark.operators.cc import connected_components
from tric_spark.operators.tc import triangles_join


def triangle_percolation(
    canon: DataFrame, key_factor: int = 10_000_000
) -> DataFrame:
    """Overlapping (vid, community) memberships under CPM k=3.

    ``canon``: canonical undirected edges (src < dst, deduped).
    ``community`` = min ``src*key_factor + dst`` edge-key reachable
    through triangle-edge adjacency.  Vertices in no triangle are absent
    (CPM leaves them unclassified by definition).
    """
    # plan-build guard (one scalar aggregate): int64 keys stay exact only
    # while max vid < key_factor and max_vid * key_factor fits in int64.
    max_vid = canon.agg(F.max("dst")).first()[0]
    if max_vid is not None and (
        max_vid >= key_factor or max_vid * key_factor >= 2**62
    ):
        raise ValueError(
            f"key_factor {key_factor} cannot encode vids up to {max_vid}; "
            "raise key_factor or widen to struct keys"
        )
    kf = F.lit(key_factor)
    tri = triangles_join(canon)  # (i, j, k), i < j < k, each exactly once
    tek = tri.select(
        (F.col("i") * kf + F.col("j")).alias("e1"),
        (F.col("i") * kf + F.col("k")).alias("e2"),
        (F.col("j") * kf + F.col("k")).alias("e3"),
    )
    # i<j<k ⇒ e1<e2<e3, so the three pairs are already canonical
    pairs = (
        tek.select(F.col("e1").alias("a"), F.col("e2").alias("b"))
        .unionAll(tek.select("e1", "e3"))
        .unionAll(tek.select("e2", "e3"))
        .distinct()
    )
    verts = (
        tek.select(F.explode(F.array("e1", "e2", "e3")).alias("vid")).distinct()
    )
    sym = pairs.unionAll(pairs.select(F.col("b"), F.col("a"))).toDF("src", "dst")
    comp = connected_components(sym, verts)
    return (
        comp.select(
            # `div` is exact integer division — `/` would round-trip
            # through double and can truncate off-by-one near 2^53
            F.explode(
                F.array(
                    F.expr(f"vid div {key_factor}"), F.col("vid") % kf
                )
            ).alias("vid"),
            F.col("comp").alias("community"),
        )
        .distinct()
    )
