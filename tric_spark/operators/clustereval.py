"""Clustering-agreement metrics: NMI and Adjusted Rand Index.

The evaluation half of the community-detection family (louvain / lp / cc /
semdedup groups all emit (id, label) frames): given two labelings of the
same id universe, how much do they agree?  Normalized mutual information
(Strehl & Ghosh 2002) and the adjusted Rand index (Hubert & Arabie 1985)
are the standard pair; both are exact functions of the contingency table.

100-TB shape: one equi-join on the id, one map-side-combined groupBy to
the contingency table (its size is |labels_a| × |labels_b| CELLS ACTUALLY
OCCUPIED — community-count scale, not corpus scale), marginals as two tiny
re-aggregates, and the metrics as broadcast 1-row folds.  All pair counts
are exact int64 (C(n,2) of a 10^12 corpus still fits), entropies are ln
(natural log on both engines — DuckDB log() is base-10, engine lore), and
every emitted float is 6dp-rounded so the DuckDB oracle replays it.

Reference parity: none (evaluation harness; builder-brief family, like
dedup.neardup_eval / similarity.ann_recall_eval).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cluster_agreement(
    a: DataFrame,
    b: DataFrame,
    id_col: str = "vid",
    label_col: str = "label",
) -> DataFrame:
    """One-row agreement report between two labelings.

    ``a`` and ``b`` each carry (id_col, label_col); ids are inner-joined,
    so the report covers the common universe.  Returns
    (n, n_labels_a, n_labels_b, h_a, h_b, nmi, ari):

    - nmi = I(A;B) / sqrt(H(A)·H(B)) — NULL when either marginal entropy
      is 0 (a single-cluster side carries no information to normalize).
    - ari = (Σ_ij C(n_ij,2) − E) / (½(Σ_i C(a_i,2) + Σ_j C(b_j,2)) − E)
      with E = Σ_i C(a_i,2)·Σ_j C(b_j,2)/C(n,2) — NULL when the
      denominator is 0 (both sides all-singletons or all-one-cluster).
    """
    ja = a.select(F.col(id_col).alias("id"), F.col(label_col).alias("la"))
    jb = b.select(F.col(id_col).alias("id"), F.col(label_col).alias("lb"))
    cont = (
        ja.join(jb, "id")
        .groupBy("la", "lb")
        .agg(F.count(F.lit(1)).alias("nij"))
        .localCheckpoint(eager=True)  # referenced by 3 aggregates below
    )
    ma = cont.groupBy("la").agg(F.sum("nij").alias("ai"))
    mb = cont.groupBy("lb").agg(F.sum("nij").alias("bj"))

    tot = cont.agg(
        F.sum("nij").cast("long").alias("n"),
        F.sum(F.col("nij") * (F.col("nij") - 1) / 2).cast("long").alias("sij"),
    )
    sa = ma.agg(
        F.count(F.lit(1)).alias("n_labels_a"),
        F.sum(F.col("ai") * (F.col("ai") - 1) / 2).cast("long").alias("si"),
    )
    sb = mb.agg(
        F.count(F.lit(1)).alias("n_labels_b"),
        F.sum(F.col("bj") * (F.col("bj") - 1) / 2).cast("long").alias("sj"),
    )
    # mutual information and entropies need n in-row: fold the 1-row
    # totals in by broadcast (the dangling-fold pattern), never a collect
    w = cont.join(F.broadcast(ma), "la").join(F.broadcast(mb), "lb")
    info = w.crossJoin(F.broadcast(tot.select("n"))).agg(
        F.sum(
            (F.col("nij") / F.col("n"))
            * F.log(
                F.col("n")
                * F.col("nij")
                / (F.col("ai") * F.col("bj")).cast("double")
            )
        ).alias("mi")
    )
    ha = ma.crossJoin(F.broadcast(tot.select("n"))).agg(
        (-F.sum((F.col("ai") / F.col("n")) * F.log(F.col("ai") / F.col("n"))))
        .alias("h_a")
    )
    hb = mb.crossJoin(F.broadcast(tot.select("n"))).agg(
        (-F.sum((F.col("bj") / F.col("n")) * F.log(F.col("bj") / F.col("n"))))
        .alias("h_b")
    )
    r = (
        tot.crossJoin(F.broadcast(sa))
        .crossJoin(F.broadcast(sb))
        .crossJoin(F.broadcast(info))
        .crossJoin(F.broadcast(ha))
        .crossJoin(F.broadcast(hb))
    )
    cn2 = (F.col("n") * (F.col("n") - 1) / 2).cast("double")
    # si·sj in double: the long×long product overflows first at web scale
    expected = F.col("si").cast("double") * F.col("sj") / cn2
    ari_den = (F.col("si") + F.col("sj")) / 2 - expected
    return r.select(
        "n",
        "n_labels_a",
        "n_labels_b",
        F.round("h_a", 6).alias("h_a"),
        F.round("h_b", 6).alias("h_b"),
        F.round(
            F.col("mi") / F.sqrt(F.nullif(F.col("h_a") * F.col("h_b"), F.lit(0.0))),
            6,
        ).alias("nmi"),
        F.round(
            (F.col("sij") - expected) / F.nullif(ari_den, F.lit(0.0)), 6
        ).alias("ari"),
    )
