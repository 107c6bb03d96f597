"""Small-motif counting beyond triangles: 4-cycles and 4-cliques.

The reference stops at triangles (tric.hpp:132-177 is the wedge-close
kernel); these extend the same oriented-DAG machinery one level up, the
way a web-graph miner counts rectangles (bipartite cores / butterfly
signals for link farms, cf. Kumar et al. "Trawling the web" WWW'99) and
K4s (dense-subgraph seeds).

Scale notes
-----------
* ``fourcycle_count`` runs on the *codegree* wedge set — size
  sum_a C(deg(a), 2), the same volume the triangle wedge pass enumerates.
  It is one self-join + one partial-aggregated groupBy; hubs are handled
  the same way the TC kernels handle them (compose with the hub-split /
  salting layout from plans/partition.py when max degree is extreme).
* ``fourclique_count`` extends the (deg,id)-oriented triangle listing by
  one more edge probe. In a (deg,id)-oriented DAG every out-degree is
  O(sqrt(m)), so the candidate set tri x out(k) is bounded the same way
  the wedge set was — this is the standard oriented k-clique listing
  (Chiba-Nishizeki), expressed as two joins + two semi-join probes that
  Catalyst runs as shuffled hash joins with AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tric_spark.operators.tc import triangles_join


def codegree_pairs(sym_edges: DataFrame) -> DataFrame:
    """(u, v, codeg) for every unordered pair u < v with >=1 common
    neighbor in the undirected graph.

    One self-join on the symmetric edge list through the shared center,
    then a map-side-combinable groupBy on the endpoint pair.
    """
    e1 = sym_edges.select(F.col("src").alias("a"), F.col("dst").alias("u"))
    e2 = sym_edges.select(F.col("src").alias("a"), F.col("dst").alias("v"))
    return (
        e1.join(e2, "a")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("codeg"))
    )


def fourcycle_count(sym_edges: DataFrame) -> int:
    """Exact number of simple 4-cycles (rectangles) in the undirected graph.

    Every 4-cycle u-a-v-b-u is identified by either of its two diagonal
    pairs ({u,v} with centers {a,b}, or {a,b} with centers {u,v}), so
    C4 = sum over pairs of C(codeg, 2) / 2 — each cycle is counted exactly
    twice. codeg excludes the pair's own edge (a center is a *third*
    vertex), so adjacent diagonals need no correction: the count C(c,2)
    chooses two distinct common neighbors, which is exactly one rectangle.
    """
    row = (
        codegree_pairs(sym_edges)
        .agg(
            (F.sum(F.col("codeg") * (F.col("codeg") - 1) / 2) / 2)
            .cast("long")
            .alias("c4")
        )
        .collect()[0]
    )
    return int(row["c4"] or 0)


def fourcliques(oriented: DataFrame, deg: DataFrame | None = None) -> DataFrame:
    """All 4-cliques (i, j, k, l) — one row per clique, exactly once.

    ``oriented`` is the DAG from :func:`tric_spark.graph.orient_by_degree`
    (pass ``deg`` so the wedge ordering matches, exactly as
    :func:`triangles_join` requires) or plain canonical id-orientation
    (``deg=None``). The triangle listing already yields i ≺ j ≺ k in the
    orientation's total order; the 4th vertex closes three DAG edges
    i→l, j→l, k→l, so it sits after k and each clique appears once.
    """
    tri = triangles_join(oriented, deg=deg)
    ext = tri.join(
        oriented.select(F.col("src").alias("k"), F.col("dst").alias("l")), "k"
    )
    ext = ext.join(
        oriented.select(F.col("src").alias("j"), F.col("dst").alias("l")),
        ["j", "l"],
        "left_semi",
    )
    ext = ext.join(
        oriented.select(F.col("src").alias("i"), F.col("dst").alias("l")),
        ["i", "l"],
        "left_semi",
    )
    return ext.select("i", "j", "k", "l")


def fourclique_count(oriented: DataFrame, deg: DataFrame | None = None) -> int:
    """Exact number of K4 subgraphs (orientation-invariant count)."""
    return fourcliques(oriented, deg=deg).count()
