"""k-core decomposition: iterative peeling. [north-rule family: standard
link-graph analytics the engine surface should cover]

``kcore_subgraph``: repeatedly remove vertices with degree < k until the
fixpoint — the maximal subgraph where every vertex has degree ≥ k.
``core_numbers``: the full decomposition (every vertex's largest k) by
peeling k = 1, 2, … — O(k_max) rounds of the same superstep loop.

Per round: one degree aggregation + one semi-join filter. Adjacency never
materializes — only the shrinking edge list — so a 100 TB edge table peels
with bounded state. localCheckpoint bounds lineage like every other
iterative kernel here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kcore_subgraph(sym_edges: DataFrame, k: int, max_iter: int = 100) -> DataFrame:
    """Symmetric edge table of the k-core (both directions), possibly empty."""
    edges = sym_edges.select("src", "dst").localCheckpoint(eager=True)
    for _ in range(max_iter):
        deg = edges.groupBy("src").agg(F.count("*").alias("d"))
        keep = deg.filter(F.col("d") >= k).select(F.col("src").alias("vid"))
        nxt = (
            edges.join(keep.withColumnRenamed("vid", "src"), "src", "left_semi")
            .join(keep.withColumnRenamed("vid", "dst"), "dst", "left_semi")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
        n_before, n_after = edges.count(), nxt.count()
        edges = nxt
        if n_after == n_before or n_after == 0:
            break
    return edges


def core_numbers(
    sym_edges: DataFrame, max_rounds: int = 1024, fold_every: int = 32
) -> DataFrame:
    """(vid, core) — every vertex's core number, single-pass batch peeling.

    One loop, one degree aggregation + one scalar min per round: the level
    k is the running max of the remaining graph's min degree; every vertex
    whose degree drops to ≤ k is peeled with core = k (vertices stranded
    with no surviving edges peel at the same level). This is the standard
    distributed peeling (Montresor et al. shape): barrier count is
    O(#peeling waves), not O(k_max × waves) like per-k re-peeling, and each
    wave touches only the shrinking edge table — bounded state at 100 TB.

    Per-wave assignments accumulate in a running union that is checkpointed
    every ``fold_every`` waves (VERDICT r4 #8): a web graph peels in
    thousands of waves, and a single O(waves)-wide union plan would blow
    Catalyst analysis cost and driver heap; the periodic fold bounds every
    plan to ≤ fold_every+1 children while keeping total work identical.

    ``max_rounds`` is a runaway guard; if it trips, the survivors are
    emitted with core = current level (clamped, with a warning) rather than
    silently dropped.
    """
    spark = sym_edges.sparkSession
    edges = sym_edges.select("src", "dst").localCheckpoint(eager=True)
    out: DataFrame | None = None
    pending: list[DataFrame] = []
    any_assigned = False

    def fold() -> None:
        """Union the pending waves into the checkpointed accumulator."""
        nonlocal out, pending
        if not pending:
            return
        acc = pending[0]
        for part in pending[1:]:
            acc = acc.union(part)
        out = acc if out is None else out.union(acc)
        out = out.localCheckpoint(eager=True)
        pending = []

    k = 0
    for _ in range(max_rounds):
        deg = edges.groupBy(F.col("src").alias("vid")).agg(F.count("*").alias("d"))
        min_d = deg.agg(F.min("d")).collect()[0][0]
        if min_d is None:  # no edges left — every vertex assigned
            break
        k = max(k, int(min_d))
        drop = deg.filter(F.col("d") <= k).select("vid")
        nxt = (
            edges.join(drop.withColumnRenamed("vid", "src"), "src", "left_anti")
            .join(drop.withColumnRenamed("vid", "dst"), "dst", "left_anti")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
        # peeled this wave = dropped ∪ stranded (all edges gone): everything
        # alive now that doesn't survive into nxt — all at level k
        gone = deg.select("vid").join(
            nxt.select(F.col("src").alias("vid")).distinct(), "vid", "left_anti"
        )
        pending.append(gone.withColumn("core", F.lit(k).cast("long")))
        any_assigned = True
        if len(pending) >= fold_every:
            fold()
        edges = nxt
    else:
        import warnings

        warnings.warn(
            f"core_numbers: max_rounds={max_rounds} reached at level {k}; "
            "emitting survivors clamped to the current level"
        )
        pending.append(
            edges.select(F.col("src").alias("vid"))
            .distinct()
            .withColumn("core", F.lit(k).cast("long"))
        )
        any_assigned = True
    if not any_assigned:
        return spark.createDataFrame([], "vid long, core long")
    fold()
    assert out is not None
    return out


def densest_core(sym_edges: DataFrame) -> DataFrame:
    """One row (k, n_vertices, n_edges, density): the max-core induced
    subgraph and its edge density ρ = |E|/|V| — the degeneracy-ordering
    readout of Charikar's densest-subgraph objective (the max core is a
    ½-approximation of the densest subgraph; Asahiro et al. / Charikar
    2000). The standard web-graph "community nucleus" probe.

    Plan shape: the peeling loop is :func:`core_numbers`; afterwards ONE
    broadcast 1-row max picks k_max, two semi-joins induce the subgraph,
    and a single aggregate reads out the counts — no collects, no extra
    supersteps, so it inherits core_numbers' bounded-state scale story.
    """
    cores = core_numbers(sym_edges).localCheckpoint(eager=True)
    kmax = cores.agg(F.max("core").alias("kmax"))
    core_v = (
        cores.crossJoin(F.broadcast(kmax))
        .filter(F.col("core") == F.col("kmax"))
        .select("vid")
    )
    induced = sym_edges.join(
        core_v.withColumnRenamed("vid", "src"), "src", "left_semi"
    ).join(core_v.withColumnRenamed("vid", "dst"), "dst", "left_semi")
    nv = core_v.agg(F.count("*").alias("n_vertices"))
    ne = induced.agg((F.count("*") / 2).cast("long").alias("n_edges"))
    return (
        kmax.select(F.col("kmax").alias("k"))
        .crossJoin(F.broadcast(nv))
        .crossJoin(F.broadcast(ne))
        .select(
            "k",
            "n_vertices",
            "n_edges",
            F.round(F.col("n_edges") / F.col("n_vertices"), 6).alias(
                "density"
            ),
        )
    )
