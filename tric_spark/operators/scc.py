"""Strongly connected components of the DIRECTED link graph, and the
Broder bow-tie decomposition built on them — THE published structural
analysis of the web graph (Broder et al., WWW 2000: CORE / IN / OUT /
tendrils / disconnected).

Not in the reference (tric counts triangles on undirected graphs); engine
breadth for the web-scale tier, same rationale as HyperANF.

Algorithm: multi-pivot Forward-Backward coloring (the standard
distributed SCC — Pregel/Giraph lineage), expressed as DataFrame
supersteps:

  outer round:
    1. TRIM to fixpoint: a vertex with no in-edges or no out-edges in the
       remaining graph is its own SCC (peels every DAG region; one
       anti-join pair per wave).
    2. COLOR to fixpoint: color(v) = max vid that reaches v (init self;
       superstep = edge-join + groupBy max — the PageRank-shaped gather).
    3. EXTRACT: every color root r (color(r)=r) is a pivot; v belongs to
       SCC(r) iff color(v)=r and v reaches r through vertices of color r
       — a backward flag propagation restricted to same-color edges. All
       roots extract simultaneously (multi-pivot), so an outer round
       peels one SCC per color class, not one per round.
    4. Remove assigned vertices, repeat.

Scale shape: every superstep is one shuffle (join + partial-agg groupBy),
state is one row per remaining vertex, and every iterate is
localCheckpoint'ed (lineage rule). Convergence checks read a count off
the just-materialized frame — no driver-side data. Assigned components
accumulate in a running union folded every ``fold_every`` waves (the
kcore VERDICT r4 #8 discipline: bounded plan depth at web peel depths).

SCC labels are the component's MINIMUM vid — deterministic and
replayable by the DuckDB reachability oracle (mutual-reach pairs).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _ckpt(df: DataFrame) -> DataFrame:
    return df.localCheckpoint(eager=True)


def strongly_connected_components(
    directed: DataFrame,
    vertices: DataFrame,
    max_outer: int = 64,
    max_inner: int = 256,
    fold_every: int = 8,
) -> DataFrame:
    """(vid, scc) — every vertex labeled with the minimum vid of its
    strongly connected component. Self-loops and duplicate edges are
    ignored; vertices absent from any edge are singleton SCCs."""
    edges = _ckpt(
        directed.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    verts = _ckpt(vertices.select("vid").distinct())

    assigned: list[DataFrame] = []
    done = None  # periodically-folded running union

    def fold(force: bool = False):
        nonlocal assigned, done
        if assigned and (force or len(assigned) >= fold_every):
            u = reduce(DataFrame.unionByName, assigned)
            done = u if done is None else done.unionByName(u)
            done = _ckpt(done)
            assigned = []

    for _ in range(max_outer):
        if verts.isEmpty():
            break

        # 1. trim to fixpoint — sources/sinks of the remaining graph are
        # singleton SCCs (their own min-vid label)
        while True:
            has_in = edges.select(F.col("dst").alias("vid")).distinct()
            has_out = edges.select(F.col("src").alias("vid")).distinct()
            keep = verts.join(has_in, "vid", "left_semi").join(
                has_out, "vid", "left_semi"
            )
            trimmed = verts.join(keep, "vid", "left_anti")
            trimmed = _ckpt(trimmed)
            if trimmed.isEmpty():
                break
            assigned.append(trimmed.select("vid", F.col("vid").alias("scc")))
            fold()
            verts = _ckpt(keep)
            edges = _ckpt(
                edges.join(verts.withColumnRenamed("vid", "src"), "src", "left_semi")
                .join(verts.withColumnRenamed("vid", "dst"), "dst", "left_semi")
                .select("src", "dst")
            )
            if verts.isEmpty():
                break
        if verts.isEmpty():
            break

        # 2. color to fixpoint: color(v) = max vid reaching v
        state = _ckpt(verts.select("vid", F.col("vid").alias("c")))
        for _ in range(max_inner):
            inc = (
                edges.join(state.withColumnRenamed("vid", "src"), "src")
                .groupBy(F.col("dst").alias("vid"))
                .agg(F.max("c").alias("cin"))
            )
            state = _ckpt(
                state.join(inc, "vid", "left").select(
                    "vid",
                    F.greatest("c", F.coalesce("cin", "c")).alias("c"),
                    (F.coalesce("cin", "c") > F.col("c")).alias("chg"),
                )
            )
            if state.filter("chg").isEmpty():
                break
        colors = state.select("vid", "c")

        # 3. extract: backward flag from each root within its color class
        ce = _ckpt(  # same-color edges only
            edges.join(colors.withColumnRenamed("vid", "src"), "src")
            .withColumnRenamed("c", "cs")
            .join(colors.withColumnRenamed("vid", "dst"), "dst")
            .filter(F.col("cs") == F.col("c"))
            .select("src", "dst")
        )
        fstate = _ckpt(colors.select("vid", "c", (F.col("vid") == F.col("c")).alias("f")))
        for _ in range(max_inner):
            hits = (
                ce.join(
                    fstate.filter("f").select(F.col("vid").alias("dst")), "dst",
                    "left_semi",
                )
                .select(F.col("src").alias("vid"))
                .distinct()
                .withColumn("hit", F.lit(True))
            )
            fstate = _ckpt(
                fstate.join(hits, "vid", "left").select(
                    "vid", "c",
                    (F.col("f") | F.coalesce("hit", F.lit(False))).alias("f"),
                    (F.coalesce("hit", F.lit(False)) & ~F.col("f")).alias("chg"),
                )
            )
            if fstate.filter("chg").isEmpty():
                break

        members = fstate.filter("f").select("vid", "c")
        labels = members.groupBy("c").agg(F.min("vid").alias("scc"))
        assigned.append(members.join(labels, "c").select("vid", "scc"))
        fold()

        verts = _ckpt(verts.join(members, "vid", "left_anti"))
        edges = _ckpt(
            edges.join(verts.withColumnRenamed("vid", "src"), "src", "left_semi")
            .join(verts.withColumnRenamed("vid", "dst"), "dst", "left_semi")
            .select("src", "dst")
        )

    if not verts.isEmpty():
        raise RuntimeError("scc did not converge within max_outer rounds")
    fold(force=True)
    if done is None:
        return vertices.select("vid", F.col("vid").alias("scc")).limit(0)
    return done


def bowtie(directed: DataFrame, vertices: DataFrame) -> DataFrame:
    """(vid, region) — Broder bow-tie map relative to the LARGEST SCC
    (ties on size broken by smallest label):

    - CORE: the largest SCC
    - IN: reaches CORE, not in it
    - OUT: reachable from CORE, not in it
    - TENDRIL: weakly connected to CORE but neither IN nor OUT nor CORE
      (Broder's tendrils AND tubes — the distinction needs path exclusion
      this map deliberately skips)
    - DISCONNECTED: not even weakly connected to CORE

    Reachability flags ride the engine's frontier BFS (operators/bfs.py)
    over forward, reversed, and symmetrized edge views; the core id is a
    2-row plan-build aggregate, not a data collect."""
    from tric_spark.operators.bfs import bfs_distances

    sccs = strongly_connected_components(directed, vertices).cache()
    top = (
        sccs.groupBy("scc")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("scc").asc())
        .limit(1)
        .collect()
    )
    if not top:
        return vertices.select("vid", F.lit("DISCONNECTED").alias("region")).limit(0)
    core_id = top[0]["scc"]

    edges = directed.select("src", "dst").filter(F.col("src") != F.col("dst"))
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    sym = edges.unionByName(rev)
    core = sccs.filter(F.col("scc") == core_id).select("vid")

    fwd = bfs_distances(edges, core).select("vid")   # reachable FROM core
    bwd = bfs_distances(rev, core).select("vid")     # reaches core
    weak = bfs_distances(sym, core).select("vid")    # weakly connected

    return (
        sccs.join(fwd.withColumn("fw", F.lit(True)), "vid", "left")
        .join(bwd.withColumn("bw", F.lit(True)), "vid", "left")
        .join(weak.withColumn("wk", F.lit(True)), "vid", "left")
        .select(
            "vid",
            F.when(F.col("scc") == core_id, "CORE")
            .when(F.coalesce("bw", F.lit(False)), "IN")
            .when(F.coalesce("fw", F.lit(False)), "OUT")
            .when(F.coalesce("wk", F.lit(False)), "TENDRIL")
            .otherwise("DISCONNECTED")
            .alias("region"),
        )
    )
