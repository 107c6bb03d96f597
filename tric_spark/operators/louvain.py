"""Distributed Louvain move phase — synchronous modularity-gain label
moves. [north-rule family: community detection beyond plain label
propagation (lp.py) — the move kernel of Blondel et al. 2008]

Each round, every vertex v considers its neighbor communities c (plus
staying) and takes the one maximizing the modularity gain of joining c.
With unit edge weights the gain ordering is EXACTLY the ordering of the
integer score

    score2(v→c) = 2m·k_{v,c} − k_v·(Σtot(c) − k_v·[v ∈ c])

(the usual ΔQ numerator scaled by the positive constant 2m²): k_{v,c} =
edges from v into c, Σtot(c) = total degree of c's members, with v's own
degree removed when scoring its CURRENT community (Blondel et al. §2,
"remove v first"). Pure int64 arithmetic — the DuckDB oracle replays
rounds bit-for-bit with no float rounding anywhere.

Determinism and convergence under SYNCHRONOUS moves:
- argmax tiebreak is (score2 desc, c asc) — staying wins ties against
  larger community ids automatically when cur is smallest;
- only HALF the vertices are active per round — vertex v may move in
  round r iff (v + r) % 2 == 0 (the alternating-parity schedule used by
  distributed Louvain implementations, e.g. Sotera's Spark one, to kill
  synchronous thrash: measured here, the full-sync variant oscillates
  with period 2 on two-triangles-plus-bridge because stale Σtot makes a
  neighbor singleton look better than the current pair forever);
- plus Grappolo's singleton-swap rule (Lu, Halappanavar & Kalyanaraman,
  ParCo 2015 §4.2): a vertex in a singleton community may move to
  another SINGLETON community only if the target label is smaller.

One round = three shuffles, all keyed joins/aggregates on the label
state: (1) k_{v,c} — edge⋈state + groupBy(v,c); (2) Σtot / community
size — state⋈deg + groupBy(c); (3) the candidate argmax window over v.
State is `checkpoint_cut` per round (CLAUDE.md: the state feeds several
joins per round, so plain localCheckpoint would compound origin stats).

int64 headroom: 2m·k_{v,c} needs log2(2m) + log2(max k_v) < 63 — fine
through ~10^9 edges × 10^5-degree hubs; at the extreme 10^12-edge scale
rescale to doubles (ordering is then approximate in the last ulp).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tric_spark.plans.lineage import checkpoint_cut


def louvain_move(
    sym_edges: DataFrame,
    rounds: int = 2,
) -> DataFrame:
    """(vid, community) after ``rounds`` synchronous move rounds from the
    all-singletons start. ``sym_edges`` must carry both directions of the
    simple undirected graph (no self-loops)."""
    edges = sym_edges.select("src", "dst")
    deg = edges.groupBy(F.col("src").alias("vid")).agg(
        F.count(F.lit(1)).alias("k")
    )
    m2 = edges.count()  # = 2m (both directions)
    lab = deg.select("vid", F.col("vid").alias("c"), "k")
    lab = checkpoint_cut(lab)

    for r in range(1, rounds + 1):
        active = F.pmod(F.col("vid") + F.lit(r), F.lit(2)) == 0
        # community totals + sizes from the state (one groupBy). r6:
        # cached — it feeds both the candidate join and the singleton-
        # guard join, whose differing rename projections defeat exchange
        # reuse, so the un-cut round computed this aggregate twice.
        # cache() computes it once and costs no extra action; released
        # after the round's state is materialized below.
        comm = lab.groupBy("c").agg(
            F.sum("k").alias("tot"), F.count(F.lit(1)).alias("csize")
        ).cache()
        # k_{v,c}: edges from ACTIVE v into each neighbor community
        # (the parity filter halves the round's biggest shuffle)
        kvc = (
            edges.filter(F.pmod(F.col("src") + F.lit(r), F.lit(2)) == 0)
            .join(lab.select(F.col("vid").alias("dst"), F.col("c")), "dst")
            .groupBy(F.col("src").alias("vid"), "c")
            .agg(F.count(F.lit(1)).alias("kvc"))
        )
        # the stay option (kvc = 0 unless v has neighbors in cur, in
        # which case the union's max() keeps the real count)
        stay = lab.filter(active).select("vid", "c", F.lit(0).alias("kvc"))
        cand = (
            kvc.unionByName(stay)
            .groupBy("vid", "c")
            .agg(F.max("kvc").alias("kvc"))
            .join(comm, "c")
            .join(lab.select("vid", F.col("c").alias("cur"), "k"), "vid")
        )
        scored = cand.select(
            "vid",
            "c",
            "cur",
            (
                F.lit(m2) * F.col("kvc")
                - F.col("k")
                * (
                    F.col("tot")
                    - F.when(F.col("c") == F.col("cur"), F.col("k")).otherwise(
                        F.lit(0)
                    )
                )
            ).alias("score2"),
            "csize",
        )
        # Grappolo singleton-swap guard: cur-size and cand-size both 1
        # and target id larger than own community id -> forbidden
        cur_sz = comm.select(
            F.col("c").alias("cur"), F.col("csize").alias("cur_size")
        )
        scored = scored.join(cur_sz, "cur").filter(
            ~(
                (F.col("cur_size") == 1)
                & (F.col("csize") == 1)
                & (F.col("c") > F.col("cur"))
                & (F.col("c") != F.col("cur"))
            )
        )
        w = Window.partitionBy("vid").orderBy(
            F.col("score2").desc(), F.col("c").asc()
        )
        # r6: re-attach k from the checkpointed state instead of the deg
        # frame — deg is a groupBy over the full edge table that was being
        # recomputed every round; lab carries the identical k values and
        # is already materialized.
        moved = (
            scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("vid", "c")
            .join(lab.select("vid", "k"), "vid")
            .select("vid", "c", "k")
        )
        nxt = moved.unionByName(lab.filter(~active).select("vid", "c", "k"))
        lab = checkpoint_cut(nxt)
        # the new state is materialized — nothing lazy references comm
        comm.unpersist()

    return lab.select("vid", F.col("c").alias("community"))


def louvain_aggregate(
    sym_edges: DataFrame,
    labels: DataFrame,
) -> DataFrame:
    """Phase-2 rollup (Blondel et al. §2): collapse each community to a
    super-vertex and return the WEIGHTED community graph
    ``(src_c, dst_c, weight)`` — weight = number of original directed
    (sym) edge rows between the two communities, so an undirected
    inter-community edge appears in both orientations with equal weight
    and intra-community mass lands on the self-loop row (src_c = dst_c,
    weight = 2× the internal undirected edge count — exactly the
    convention the next-level weighted move phase needs).

    ``labels``: (vid, community). Shape: two vid joins + ONE groupBy on
    the (src_c, dst_c) pair — the standard coarsening shuffle; the
    output is bounded by the community count squared but in practice by
    the original edge count."""
    la = labels.select(F.col("vid").alias("src"), F.col("community").alias("src_c"))
    lb = labels.select(F.col("vid").alias("dst"), F.col("community").alias("dst_c"))
    return (
        sym_edges.select("src", "dst")
        .join(la, "src")
        .join(lb, "dst")
        .groupBy("src_c", "dst_c")
        .agg(F.count(F.lit(1)).alias("weight"))
    )
