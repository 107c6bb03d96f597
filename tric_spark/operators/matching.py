"""Maximal matching via parallel greedy edge selection, hash-deterministic.
[north-rule family: the edge-side symmetry-breaking primitive next to
mis.py's vertex-side Luby — pairing/assignment passes over massive graphs,
and the classic 2-approximation to maximum matching]

Israeli & Itai (Inf. Process. Lett. 22(2), 1986) shape: every round each
surviving edge compares its priority against all edges sharing either
endpoint; strict local minima enter the matching, their endpoints'
incident edges deactivate. O(log m) rounds w.h.p., one shuffle per round.

Fixed priorities make the OUTPUT round-structure-independent: with a
per-edge priority drawn once (not per round), the parallel rounds compute
exactly the sequential greedy matching over the priority-sorted edge
list — a unique, replayable result (the same argument as Blelloch,
Fineman & Shun SPAA'12 for deterministic parallel greedy). Priority is
md5("mm:{seed}:{src}:{dst}") over the canonical (src<dst) edge — pure,
parallelism-independent, replayable verbatim in DuckDB; distinct edges
give distinct preimages so ties cannot occur short of an md5 collision
(the mis.py assumption).

Spark shape per round: endpoint-min is one map-side-combined groupBy over
the exploded (vid, p) view; winners are two joins + a filter; the
surviving edge list shrinks monotonically via two left_anti joins against
the matched-vertex frame, eagerly checkpointed (lineage rule). State is
only the surviving edges — after a few rounds a small fraction of m.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _edge_priority(seed: int):
    return F.md5(
        F.concat_ws(
            ":",
            F.lit("mm"),
            F.lit(str(seed)),
            F.col("src").cast("string"),
            F.col("dst").cast("string"),
        )
    )


def maximal_matching(
    canon_edges: DataFrame,
    seed: int = 42,
    rounds: int | None = None,
    max_rounds: int = 64,
    local_cutover: int | None = 65536,
) -> DataFrame:
    """(src, dst) — the greedy maximal matching of the undirected graph,
    canonical orientation preserved. ``canon_edges`` is the deduped
    src<dst edge list (graph.canonical_edges). ``rounds`` fixes the number
    of supersteps (the oracle-replayable mode — the matching is already
    maximal once no edges survive, and the output never changes after
    that); ``None`` loops until the surviving edge list is empty (the
    global-minimum edge always wins a round, so progress is guaranteed).

    ``local_cutover`` (run-to-empty mode only): once the surviving edge
    list fits under this row count, finish the greedy matching
    driver-side in one bounded collect instead of draining the tail with
    O(log m) straggler supersteps — the r6 measurement: at sf0.1 the
    LAST 136 edges cost six ~0.5 s rounds, half the operator's wall
    time. The output is IDENTICAL by the determinism argument above:
    with fixed per-edge priorities the parallel rounds compute exactly
    the sequential greedy matching over the priority-sorted edge list,
    which is what the local finish runs on the remaining subgraph. The
    collect is bounded by ``local_cutover`` rows at ANY graph scale (the
    tail of a shrinking Israeli–Itai run, never corpus-sized data);
    ``None`` disables it. Fixed-``rounds`` replay mode never cuts over
    (a partial R-round matching is the contract there).
    """
    edges = (
        canon_edges.select("src", "dst")
        .withColumn("p", _edge_priority(seed))
        .localCheckpoint(eager=True)
    )
    matched: list[DataFrame] = []
    local_pairs: list = []
    total = rounds if rounds is not None else max_rounds
    for _ in range(total):
        if rounds is None and local_cutover is not None:
            n_left = edges.count()  # cheap: edges is materialized
            if n_left == 0:
                break
            if n_left <= local_cutover:
                # bounded local finish: sequential greedy over the
                # priority-sorted remainder — the exact matching the
                # remaining parallel rounds would compute
                taken: set = set()
                for r in sorted(edges.collect(), key=lambda r: r["p"]):
                    if r["src"] not in taken and r["dst"] not in taken:
                        taken.add(r["src"])
                        taken.add(r["dst"])
                        local_pairs.append((r["src"], r["dst"]))
                break
        elif edges.isEmpty():
            break
        # r6: cache the endpoint-min aggregate — it feeds BOTH winner-join
        # build sides, whose differing rename projections defeat exchange
        # reuse, so the un-cut round ran the union+groupBy over the
        # surviving edge list twice. cache() computes it once at the
        # first build and costs no extra action; it is released as soon
        # as the round's state is materialized below.
        vmin = (
            edges.select(F.col("src").alias("vid"), "p")
            .union(edges.select(F.col("dst").alias("vid"), "p"))
            .groupBy("vid")
            .agg(F.min("p").alias("mp"))
            .cache()
        )
        win = (
            edges.join(
                vmin.withColumnsRenamed({"vid": "src", "mp": "mps"}), "src"
            )
            .join(vmin.withColumnsRenamed({"vid": "dst", "mp": "mpd"}), "dst")
            .filter((F.col("p") == F.col("mps")) & (F.col("p") == F.col("mpd")))
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
        matched.append(win)
        mv = (
            win.select(F.col("src").alias("vid"))
            .union(win.select(F.col("dst").alias("vid")))
            .distinct()
        )
        edges = (
            edges.join(mv.withColumnRenamed("vid", "src"), "src", "left_anti")
            .join(mv.withColumnRenamed("vid", "dst"), "dst", "left_anti")
            .select("src", "dst", "p")
            .localCheckpoint(eager=True)
        )
        # win and edges are materialized — nothing lazy references vmin
        vmin.unpersist()
    if local_pairs:
        spark = canon_edges.sparkSession
        matched.append(
            spark.createDataFrame(
                local_pairs, canon_edges.select("src", "dst").schema
            )
        )
    if not matched:
        return canon_edges.select("src", "dst").limit(0)
    out = matched[0]
    for w in matched[1:]:
        out = out.union(w)
    return out
