"""Power-iteration PageRank over the edge table. [north-rule]

Not in the reference (tric counts triangles only); semantics fixed by
SURVEY §2.5: damping d=0.85, uniform 1/N init, dangling mass redistributed
uniformly every superstep, convergence when max|r − r'| < tol. Verified
against a dense numpy oracle with allclose(atol=1e-6).

Spark shape per superstep (the scale-critical part):
    contribs = ranks ⋈ edges on src  →  groupBy(dst).sum   (ONE shuffle)
The edges side is hash-partitioned on src once and reused every superstep;
ranks are small (one row per vertex, two columns). Dangling mass is a 1-row
aggregate folded INTO the step plan via a broadcast cross join — never a
per-superstep driver collect — so supersteps stay fully lazy and chain even
on dangling graphs. At 10^12 scale the ranks⋈edges join is shuffle-on-src
co-located with the static edge partitioning, and AQE skew-join splits hub
partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tric_spark.streaming.supersteps import SuperstepDriver


def _out_degrees(directed: DataFrame) -> DataFrame:
    return directed.groupBy(F.col("src").alias("vid")).agg(
        F.count("*").alias("out_deg")
    )


def pagerank(
    directed: DataFrame,
    vertices: DataFrame,
    d: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    driver: SuperstepDriver | None = None,
    chain: int = 3,
    check_every: int = 1,
) -> DataFrame:
    """(vid, rank) at convergence. ``directed`` is the directed link graph
    (src, dst); ``vertices`` the full vertex set (vid) — needed because
    pages with no in-links still hold rank.

    ``driver``: optional checkpointing superstep driver for resumable runs.
    ``check_every``: in convergence mode (tol > 0), chain this many lazy
    supersteps between checkpoint+delta barriers; the stopping rule becomes
    "delta across ``check_every`` steps < tol", which only ever runs extra
    iterations (the multi-step delta upper-bounds each per-step delta), so
    the returned iterate is at least as converged.
    """
    from tric_spark.graph import out_adjacency

    n_b = vertices.count()
    if n_b == 0:
        return vertices.withColumn("rank", F.lit(0.0))
    n = float(n_b)
    edges = directed.select("src", "dst")
    # adjacency-list form, computed once and cached: per superstep only the
    # n-row rank state shuffles (to the adjacency's partitioning), never the
    # m-row edge table; exploded contributions partial-aggregate map-side
    adj = out_adjacency(edges).cache()
    out_deg = adj.select("vid", "out_deg")

    # dangling vertices detected ONCE — symmetric link graphs have none, and
    # the dangling branch of the step plan is skipped entirely for them
    has_dangling = adj.count() < n_b

    ranks = vertices.withColumn("rank", F.lit(1.0 / n))
    state_schema = "vid long, rank double"

    def step(rk: DataFrame) -> DataFrame:
        contribs = (
            adj.join(rk, "vid")
            .select(
                F.explode("nbrs").alias("vid"),
                (F.col("rank") / F.col("out_deg")).alias("c"),
            )
            .groupBy("vid")
            .agg(F.sum("c").alias("in_mass"))
        )
        new = rk.select("vid").join(contribs, "vid", "left")
        if has_dangling:
            # mass sitting on dangling vertices (no out-links), redistributed
            # uniformly — a 1-row aggregate broadcast into the plan, NOT a
            # driver collect: the step stays fully lazy, so dangling graphs
            # chain supersteps exactly like dangling-free ones (the identical
            # rk subplan feeding both branches is deduplicated by Spark's
            # exchange reuse within the one action that runs the chain)
            dang = (
                rk.join(out_deg, "vid", "left_anti")
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm"))
            )
            new = new.crossJoin(F.broadcast(dang))
            base = F.lit((1.0 - d) / n) + F.lit(d) * F.col("_dm") / F.lit(n)
        else:
            base = F.lit((1.0 - d) / n)
        return new.select(
            "vid",
            (base + F.lit(d) * F.coalesce(F.col("in_mass"), F.lit(0.0))).alias("rank"),
        )

    def delta(old: DataFrame, new: DataFrame) -> float:
        return (
            old.withColumnRenamed("rank", "old_rank")
            .join(new, "vid")
            .agg(F.max(F.abs(F.col("rank") - F.col("old_rank"))))
            .collect()[0][0]
        )

    if driver is not None:
        return driver.run(
            init=ranks,
            step=step,
            converged=lambda old, new, _i: delta(old, new) < tol,
            max_iter=max_iter,
            state_schema=state_schema,
        )

    # localCheckpoint truncates lineage — without it the logical plan grows
    # with iterations and Catalyst analysis cost/driver heap explode long
    # before the data does. The materialization is also a driver barrier
    # (the non-scaling term of a superstep), so fixed-iteration mode chains
    # `chain` supersteps lazily per checkpoint — 3× fewer barriers, bounded
    # plans — and convergence mode chains `check_every` steps per
    # checkpoint+delta. Steps are fully lazy even on dangling graphs (the
    # dangling mass is an in-plan broadcast aggregate), so both modes chain
    # unconditionally.
    cur = ranks.localCheckpoint(eager=True)
    if tol > 0:
        done = 0
        while done < max_iter:
            block = min(check_every, max_iter - done)
            nxt = cur
            for _ in range(block):
                nxt = step(nxt)
            nxt = nxt.localCheckpoint(eager=True)
            done += block
            dl = delta(cur, nxt)
            cur = nxt
            if dl < tol:
                break
        return cur
    for i in range(max_iter):
        cur = step(cur)
        if (i + 1) % chain == 0 or i == max_iter - 1:
            cur = cur.localCheckpoint(eager=True)
    return cur


def weighted_pagerank(
    directed_w: DataFrame,
    vertices: DataFrame,
    d: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    chain: int = 3,
) -> DataFrame:
    """(vid, rank) — PageRank where u distributes rank ∝ edge weight:
    contribution to v is r(u)·w(u,v)/Σ_x w(u,x). Input: (src, dst, weight)
    directed edges. Same superstep shape as the unweighted kernel — the
    weighted adjacency (vid, [(nbr, w/Σw)]) is cached once; fixed-iteration
    mode chains ``chain`` lazy supersteps per checkpoint like
    :func:`pagerank` (steps are fully lazy: dangling mass is in-plan)."""
    w_adj = (
        directed_w.groupBy(F.col("src").alias("vid"))
        .agg(
            F.collect_list(F.struct("dst", "weight")).alias("nbrs"),
            F.sum("weight").alias("w_total"),
        )
        .cache()
    )
    n_b = vertices.count()
    if n_b == 0:
        return vertices.withColumn("rank", F.lit(0.0))
    n = float(n_b)
    has_dangling = w_adj.count() < n_b
    out_vids = w_adj.select("vid")
    ranks = vertices.withColumn("rank", F.lit(1.0 / n))

    def step(rk: DataFrame) -> DataFrame:
        contribs = (
            w_adj.join(rk, "vid")
            .select(
                F.explode("nbrs").alias("e"),
                (F.col("rank") / F.col("w_total")).alias("r_per_w"),
            )
            .select(
                F.col("e.dst").alias("vid"),
                (F.col("e.weight") * F.col("r_per_w")).alias("c"),
            )
            .groupBy("vid")
            .agg(F.sum("c").alias("in_mass"))
        )
        new = vertices.join(contribs, "vid", "left")
        if has_dangling:
            # in-plan broadcast 1-row dangling aggregate (no driver collect)
            dang = (
                rk.join(out_vids, "vid", "left_anti")
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm"))
            )
            new = new.crossJoin(F.broadcast(dang))
            base = F.lit((1.0 - d) / n) + F.lit(d) * F.col("_dm") / F.lit(n)
        else:
            base = F.lit((1.0 - d) / n)
        return new.select(
            "vid",
            (base + F.lit(d) * F.coalesce("in_mass", F.lit(0.0))).alias("rank"),
        )

    cur = ranks.localCheckpoint(eager=True)
    if tol > 0:
        for _ in range(max_iter):
            nxt = step(cur).localCheckpoint(eager=True)
            dl = (
                cur.withColumnRenamed("rank", "old_rank")
                .join(nxt, "vid")
                .agg(F.max(F.abs(F.col("rank") - F.col("old_rank"))))
                .collect()[0][0]
            )
            cur = nxt
            if dl < tol:
                break
        return cur
    for i in range(max_iter):
        cur = step(cur)
        if (i + 1) % chain == 0 or i == max_iter - 1:
            cur = cur.localCheckpoint(eager=True)
    return cur


def personalized_pagerank(
    directed: DataFrame,
    vertices: DataFrame,
    sources: DataFrame,
    d: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    chain: int = 3,
) -> DataFrame:
    """(vid, rank) — PageRank with teleportation restricted to ``sources``
    (uniform over the seed set). Dangling mass also teleports to the seeds
    (in-plan broadcast aggregate — steps are fully lazy, so fixed-iteration
    mode chains ``chain`` supersteps per checkpoint). The standard
    seed-relevance ranking for link graphs."""
    from tric_spark.graph import out_adjacency

    n_src = sources.count()
    if n_src == 0:
        raise ValueError("personalized_pagerank needs a non-empty source set")
    edges = directed.select("src", "dst")
    adj = out_adjacency(edges).cache()
    out_deg = adj.select("vid", "out_deg")
    has_dangling = adj.count() < vertices.count()

    # teleport column: 1/|S| on seeds, 0 elsewhere — joined once, reused
    vert_e = vertices.join(
        sources.select("vid").distinct().withColumn("e", F.lit(1.0 / n_src)), "vid", "left"
    ).select("vid", F.coalesce("e", F.lit(0.0)).alias("e")).cache()
    vert_e.count()

    ranks = vert_e.select("vid", F.col("e").alias("rank"))

    def step(rk: DataFrame) -> DataFrame:
        contribs = (
            adj.join(rk, "vid")
            .select(F.explode("nbrs").alias("vid"), (F.col("rank") / F.col("out_deg")).alias("c"))
            .groupBy("vid")
            .agg(F.sum("c").alias("in_mass"))
        )
        new = vert_e.join(contribs, "vid", "left")
        if has_dangling:
            # dangling mass teleports to the seeds — in-plan broadcast 1-row
            # aggregate, no driver collect
            dang = (
                rk.join(out_deg, "vid", "left_anti")
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm"))
            )
            new = new.crossJoin(F.broadcast(dang))
            dm = F.col("_dm")
        else:
            dm = F.lit(0.0)
        return new.select(
            "vid",
            (
                F.lit(1.0 - d) * F.col("e")
                + F.lit(d)
                * (F.coalesce(F.col("in_mass"), F.lit(0.0)) + dm * F.col("e"))
            ).alias("rank"),
        )

    cur = ranks.localCheckpoint(eager=True)
    if tol > 0:
        for _ in range(max_iter):
            nxt = step(cur).localCheckpoint(eager=True)
            dl = (
                cur.withColumnRenamed("rank", "old_rank")
                .join(nxt, "vid")
                .agg(F.max(F.abs(F.col("rank") - F.col("old_rank"))))
                .collect()[0][0]
            )
            cur = nxt
            if dl < tol:
                break
        return cur
    for i in range(max_iter):
        cur = step(cur)
        if (i + 1) % chain == 0 or i == max_iter - 1:
            cur = cur.localCheckpoint(eager=True)
    return cur
