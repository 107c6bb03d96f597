"""Distributed Lloyd k-means over an embedding column.

[Training-data-pipeline op, builder-brief "similarity / embedding"
family: cluster-then-curate is the backbone of SemDeDup-style semantic
dedup (Abbas et al. 2023) and cluster-balanced data mixes; the reference
engine (C++/MPI, /root/reference) has no ML kernels — this is engine
breadth per SURVEY §2.5's pipeline checklist, built the same way the
ANN/SemDeDup family here is (similarity.py / semdedup.py).]

Determinism contract (the oracle replays the TRAJECTORY, not a fixpoint —
the trustrank.py test-time lore):

- init: centroids are the ``k`` vectors whose ``md5("km:{seed}:" ||
  vec_id)`` sort first (distinct ids → distinct digests → no ties);
  cluster ids 1..k follow that order.
- assignment: squared-L2 distance ROUNDED 6dp, argmin with cluster-id
  tie-break — the same rounded-before-compare rule every float oracle in
  this repo uses.
- update: per-dimension mean rounded 6dp, so both engines feed
  bit-identical centroids into the next superstep. A cluster that
  captures no points this round simply drops out (standard Lloyd forfeit;
  deterministic because assignments are).
- exactly ``iters`` assign+update supersteps, then one final assignment.

Scale shape (100 TB story): centroids are a k×dim frame — broadcast, so
the n×k distance table is a map-side crossJoin with NO shuffle of the
points; the argmin is one struct-min groupBy on vid (map-side partial
agg); the update is one posexplode + (cluster, pos) partial agg with
k·dim output rows. Init is TakeOrderedAndProject (distributed partial
top-k — no global sort). Per-superstep state is O(k·dim), checkpointed
eagerly per CLAUDE.md's lineage rule; the points frame is scanned, never
collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dist2(v, c):
    """Rounded squared L2 — bind ONCE per projection (HOF-lambda lore)."""
    return F.round(
        F.aggregate(
            F.zip_with(v, c, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )


def _assign(pts: DataFrame, cen: DataFrame) -> DataFrame:
    """(vid, cluster, d): each point's nearest centroid under the rounded
    distance with cluster-id tie-break."""
    d = pts.crossJoin(F.broadcast(cen)).select(
        "vid", "cluster", _dist2(F.col("v"), F.col("c")).alias("d")
    )
    return (
        d.groupBy("vid")
        .agg(F.min(F.struct("d", "cluster")).alias("m"))
        .select("vid", F.col("m.cluster").alias("cluster"), F.col("m.d").alias("d"))
    )


def kmeans(
    points: DataFrame,
    k: int = 8,
    iters: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Lloyd k-means; returns ``(assignments, centroids)``.

    assignments: (vid, cluster, d) — final nearest-centroid labels with
    the rounded squared distance. centroids: (cluster, c) after the last
    update (clusters that went empty are absent).
    """
    pts = (
        points.select(
            F.col(id_col).alias("vid"),
            F.transform(vec_col, lambda x: x.cast("double")).alias("v"),
        )
        .localCheckpoint(eager=True)
    )
    seeded = pts.withColumn(
        "r", F.md5(F.concat(F.lit(f"km:{seed}:"), F.col("vid").cast("string")))
    )
    # orderBy+limit compiles to TakeOrderedAndProject — distributed top-k,
    # no single-task global sort; the k-row window after it is trivial.
    top = seeded.orderBy("r", "vid").limit(k)
    cen = (
        top.withColumn("cluster", F.row_number().over(Window.orderBy("r", "vid")))
        .select("cluster", F.col("v").alias("c"))
        .localCheckpoint(eager=True)
    )
    for _ in range(iters):
        assign = _assign(pts, cen)
        cen = (
            pts.join(assign.select("vid", "cluster"), "vid")
            .select("cluster", F.posexplode("v").alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(F.round(F.avg("val"), 6).alias("cv"))
            .groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "cv"))).alias("pc"))
            .select(
                "cluster", F.transform("pc", lambda s: s["cv"]).alias("c")
            )
            .localCheckpoint(eager=True)
        )
    return _assign(pts, cen), cen


def kmeans_summary(assignments: DataFrame) -> DataFrame:
    """(cluster, n, inertia): cluster sizes and the rounded within-cluster
    sum of squared distances — the Lloyd objective readout."""
    return assignments.groupBy("cluster").agg(
        F.count("*").alias("n"),
        F.round(F.sum("d"), 6).alias("inertia"),
    )
