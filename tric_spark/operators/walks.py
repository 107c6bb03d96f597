"""Deterministic seeded random walks over the link graph — the sampling
primitive behind node2vec/DeepWalk-style embedding corpora and Monte-Carlo
PageRank. Not in the reference (tric counts triangles only); engine
breadth for the training-data-pipeline tier.

Determinism is the design center: the neighbor chosen at step t of walk w
standing on vertex v is

    idx = int(hex(md5("w:{seed}:{w}:{t}:{v}"))[0:6], 16) mod deg(v)
    next = sorted_neighbors(v)[idx]

a pure function of (seed, walk, step, position) — the same walk table
materializes at ANY parallelism (the reference's parallel-LCG determinism
invariant, utils.hpp:200–385, carried to walks), re-runs are reproducible,
and the DuckDB oracle replays every hop exactly (md5 + hex parse are
engine-portable; 6 hex digits < 2^24 so the mod is exact int math).

Scale shape: the adjacency (vid, sorted nbrs, deg) is built ONCE and
cached; per step only the walk-position state (one row per walk) joins it
— shuffle on the position key, hash-partitioned, AQE-skew-split on hub
positions. The trajectory rides INSIDE the state as a growing array (row
width O(steps), never a per-step output union whose lazy tails would
re-execute the join chain), steps chain lazily between periodic
localCheckpoints (the lineage rule every iterative kernel here follows),
and one posexplode at the end yields the (walk_id, step, vid) rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _step_hash(walk_id, t: int, cur, seed: int):
    """First 6 hex digits of md5("w:{seed}:{walk}:{t}:{vid}") as int64 —
    replayed verbatim by the oracle SQL."""
    s = F.concat_ws(
        ":", F.lit("w"), F.lit(str(seed)), walk_id.cast("string"),
        F.lit(str(t)), cur.cast("string"),
    )
    return F.conv(F.substring(F.md5(s), 1, 6), 16, 10).cast("long")


def random_walks(
    sym_edges: DataFrame,
    num_steps: int = 4,
    starts: DataFrame | None = None,
    seed: int = 42,
    chain: int = 4,
) -> DataFrame:
    """(walk_id, step, vid) trajectories: one walk per start vertex,
    ``num_steps`` uniform hops over the symmetric adjacency (sorted
    neighbor lists, md5-seeded index — see module docstring).

    ``starts`` defaults to every vertex with at least one edge (walks from
    an isolated vertex have nowhere to go; on the symmetric graph every
    non-isolated position always has a next hop, so all walks run the full
    ``num_steps``). step is int64 0..num_steps, step 0 = the start itself.
    """
    adj = (
        sym_edges.groupBy(F.col("src").alias("vid"))
        .agg(
            F.array_sort(F.collect_list("dst")).alias("nbrs"),
            F.count("*").alias("deg"),
        )
        .cache()
    )
    if starts is None:
        starts = adj.select("vid")
    state = starts.select(
        F.col("vid").alias("walk_id"),
        F.col("vid").alias("cur"),
        F.array(F.col("vid")).alias("path"),
    ).localCheckpoint(eager=True)

    for t in range(1, num_steps + 1):
        idx = F.pmod(_step_hash(F.col("walk_id"), t, F.col("cur"), seed), F.col("deg"))
        nxt = F.element_at("nbrs", (idx + 1).cast("int"))
        state = (
            state.join(adj, state["cur"] == adj["vid"])
            .select(
                "walk_id",
                nxt.alias("cur"),
                F.array_append("path", nxt).alias("path"),
            )
        )
        if t % chain == 0 or t == num_steps:
            state = state.localCheckpoint(eager=True)

    return state.select(
        "walk_id", F.posexplode("path").alias("step", "vid")
    ).select("walk_id", F.col("step").cast("long").alias("step"), "vid")


def biased_walks(
    sym_edges: DataFrame,
    num_steps: int = 4,
    p: float = 1.0,
    q: float = 0.5,
    starts: DataFrame | None = None,
    seed: int = 42,
    chain: int = 4,
) -> DataFrame:
    """(walk_id, step, vid) node2vec second-order biased walks (Grover &
    Leskovec KDD'16 §3.2.2): standing at ``cur`` having arrived from
    ``prev``, neighbor x draws unnormalized weight 1/p if x == prev
    (return), 1 if x is also a neighbor of prev (the BFS-ish triangle
    hop), 1/q otherwise (the DFS-ish outward hop). Step 1 has no prev and
    hops uniformly.

    Determinism + oracle portability: weights are pre-scaled to INTEGERS
    (w = round(10^4/p), 10^4, round(10^4/q)), the draw is
    thr = int64(first 12 hex digits of md5('b:{seed}:{walk}:{t}:{cur}'))
    mod total_weight, and the chosen neighbor is the first index of the
    sorted neighbor list whose cumulative weight exceeds thr — exact
    integer math on both engines, no float boundary.

    Scale shape: two adjacency joins per superstep (cur's list and prev's
    list); the weighted pick is ONE F.aggregate struct-accumulator
    expression over the in-row neighbor array — pure whole-stage-codegen,
    no explode, no window, no extra shuffle. The prev-membership probe is
    array_contains over prev's sorted list (O(deg_cur·deg_prev) only on
    hub→hub hops; at web scale swap that probe for a pre-joined edge
    triple frame — the output contract is unchanged).
    """
    if p <= 0 or q <= 0:
        raise ValueError("p and q must be positive")
    w_ret, w_in, w_out = round(10_000 / p), 10_000, round(10_000 / q)
    if min(w_ret, w_out) < 1:
        raise ValueError("p and q must be <= 10000 (integer weight floor)")

    adj = (
        sym_edges.groupBy(F.col("src").alias("vid"))
        .agg(
            F.array_sort(F.collect_list("dst")).alias("nbrs"),
            F.count("*").alias("deg"),
        )
        .cache()
    )
    if starts is None:
        starts = adj.select("vid")

    def _hash12(t: int, cur):
        s = F.concat_ws(
            ":", F.lit("b"), F.lit(str(seed)),
            F.col("walk_id").cast("string"), F.lit(str(t)),
            cur.cast("string"),
        )
        return F.conv(F.substring(F.md5(s), 1, 12), 16, 10).cast("long")

    # step 1: uniform (no prev yet), prev becomes the start
    st = starts.select(
        F.col("vid").alias("walk_id"),
        F.col("vid").alias("cur"),
        F.array(F.col("vid")).alias("path"),
    )
    idx1 = F.pmod(_hash12(1, F.col("cur")), F.col("deg"))
    nxt1 = F.element_at("nbrs", (idx1 + 1).cast("int"))
    state = (
        st.join(adj, st["cur"] == adj["vid"])
        .select(
            "walk_id",
            F.col("cur").alias("prev"),
            nxt1.alias("cur"),
            F.array_append("path", nxt1).alias("path"),
        )
        .localCheckpoint(eager=True)
    )

    pa = adj.select(
        F.col("vid").alias("pvid"), F.col("nbrs").alias("pnbrs")
    )
    for t in range(2, num_steps + 1):
        j = state.join(adj, state["cur"] == adj["vid"]).join(
            pa, state["prev"] == F.col("pvid")
        )
        prev_c = F.col("prev")
        pnbrs_c = F.col("pnbrs")
        weights = F.transform(
            "nbrs",
            lambda x: F.when(x == prev_c, F.lit(w_ret))
            .when(F.array_contains(pnbrs_c, x), F.lit(w_in))
            .otherwise(F.lit(w_out))
            .cast("long"),
        )
        tot = F.aggregate(
            weights, F.lit(0).cast("long"), lambda acc, w: acc + w
        )
        thr = F.pmod(_hash12(t, F.col("cur")), tot)
        pick = F.aggregate(
            weights,
            F.struct(
                F.lit(0).cast("long").alias("cum"),
                F.lit(-1).alias("idx"),
                F.lit(0).alias("i"),
            ),
            lambda acc, w: F.struct(
                (acc["cum"] + w).alias("cum"),
                F.when(acc["idx"] >= 0, acc["idx"])
                .when(acc["cum"] + w > thr, acc["i"])
                .otherwise(F.lit(-1))
                .alias("idx"),
                (acc["i"] + 1).alias("i"),
            ),
            lambda acc: acc["idx"],
        )
        # The pick expression holds HOF lambdas (transform + aggregate):
        # instantiating it TWICE in one projection makes the copies'
        # NamedLambdaVariables collide and the two occurrences evaluate
        # to different (wrong) indices — materialize nxt ONCE, then
        # reference it by name in the final projection.
        nxt = F.element_at("nbrs", (pick + 1).cast("int"))
        state = j.select(
            "walk_id", "cur", "path", nxt.alias("nxt")
        ).select(
            "walk_id",
            F.col("cur").alias("prev"),
            F.col("nxt").alias("cur"),
            F.array_append("path", F.col("nxt")).alias("path"),
        )
        if t % chain == 0 or t == num_steps:
            state = state.localCheckpoint(eager=True)

    return state.select(
        "walk_id", F.posexplode("path").alias("step", "vid")
    ).select("walk_id", F.col("step").cast("long").alias("step"), "vid")


def mc_pagerank(
    sym_edges: DataFrame,
    c: float = 0.85,
    walks_per_vertex: int = 2,
    max_steps: int = 8,
    seed: int = 42,
) -> DataFrame:
    """(vid, visits, rank_est) Monte-Carlo PageRank (Avrachenkov et al.
    2007, "Monte Carlo methods in PageRank computation"): R walks start at
    every vertex; at each step a walk TERMINATES with probability 1-c
    (the teleport event) else hops uniformly; rank_est(v) =
    visits(v)·(1-c)/(n·R). Walks are truncated at ``max_steps`` (residual
    geometric mass c^max_steps is a documented bias shared by the oracle
    replay, which runs the identical truncation).

    Determinism: the continue/terminate coin is
    int(first 6 hex of md5('mcc:{seed}:{walk}:{rep}:{t}:{cur}')) mod 10^6
    < round(c·10^6), and the hop index reuses the uniform md5 pick with
    tag 'mch' — both exact-integer and engine-portable.

    Scale shape: state is one row per LIVE walk (monotonically shrinking
    ~c^t); each superstep is one filter + one adjacency join, checkpointed
    eagerly so the per-step visit snapshots unioned at the end are
    materialized frames, not lazy join-chain tails. The final union is
    max_steps+1 frames → one groupBy; the normalizing total rides in as a
    broadcast 1-row aggregate (zero driver collects).
    """
    cint = round(c * 1_000_000)
    adj = (
        sym_edges.groupBy(F.col("src").alias("vid"))
        .agg(
            F.array_sort(F.collect_list("dst")).alias("nbrs"),
            F.count("*").alias("deg"),
        )
        .cache()
    )
    reps = [(k,) for k in range(walks_per_vertex)]
    rep_df = adj.sparkSession.createDataFrame(reps, "rep int")
    state = (
        adj.select(F.col("vid").alias("walk_id"))
        .crossJoin(F.broadcast(rep_df))
        .select("walk_id", "rep", F.col("walk_id").alias("cur"))
        .localCheckpoint(eager=True)
    )

    def _h6(tag: str, t: int):
        s = F.concat_ws(
            ":", F.lit(tag), F.lit(str(seed)),
            F.col("walk_id").cast("string"), F.col("rep").cast("string"),
            F.lit(str(t)), F.col("cur").cast("string"),
        )
        return F.conv(F.substring(F.md5(s), 1, 6), 16, 10).cast("long")

    snapshots = [state.select("cur")]
    for t in range(1, max_steps + 1):
        live = state.filter(F.pmod(_h6("mcc", t), F.lit(1_000_000)) < cint)
        idx = F.pmod(_h6("mch", t), F.col("deg"))
        nxt = F.element_at("nbrs", (idx + 1).cast("int"))
        state = (
            live.join(adj, live["cur"] == adj["vid"])
            .select("walk_id", "rep", nxt.alias("cur"))
            .localCheckpoint(eager=True)
        )
        snapshots.append(state.select("cur"))

    visits = snapshots[0]
    for s in snapshots[1:]:
        visits = visits.unionAll(s)
    counts = visits.groupBy(F.col("cur").alias("vid")).agg(
        F.count("*").alias("visits")
    )
    n_walks = snapshots[0].agg(F.count("*").alias("_nw"))
    return counts.crossJoin(F.broadcast(n_walks)).select(
        "vid",
        "visits",
        F.round(
            F.col("visits") * F.lit(1.0 - c) / F.col("_nw"), 6
        ).alias("rank_est"),
    )


def walk_cooccurrence(
    sym_edges: DataFrame,
    num_steps: int = 4,
    window: int = 2,
    starts: DataFrame | None = None,
    seed: int = 42,
) -> DataFrame:
    """(a, b, cnt) with a < b — skip-gram co-occurrence counts over the
    walk corpus: unordered vertex pairs appearing within ``window`` steps
    of each other on the same walk (self-pairs from revisits dropped).
    This is the node2vec/DeepWalk preprocessing step (Grover & Leskovec
    KDD'16 §3.2): the pair table IS the training corpus an embedding
    trainer consumes.

    Shape: the trajectory self-join is keyed on walk_id, and a walk is at
    most ``num_steps``+1 rows, so the per-key join fan-out is a small
    constant (≤ (steps+1)·window pairs per walk) — the groupBy on the
    canonical pair is the only real shuffle."""
    traj = random_walks(sym_edges, num_steps, starts, seed)
    x = traj.select(
        "walk_id", F.col("step").alias("si"), F.col("vid").alias("vi")
    )
    y = traj.select(
        "walk_id", F.col("step").alias("sj"), F.col("vid").alias("vj")
    )
    pairs = (
        x.join(y, "walk_id")
        .filter(
            (F.col("sj") > F.col("si"))
            & (F.col("sj") - F.col("si") <= window)
            & (F.col("vi") != F.col("vj"))
        )
    )
    return pairs.groupBy(
        F.least("vi", "vj").alias("a"), F.greatest("vi", "vj").alias("b")
    ).agg(F.count(F.lit(1)).alias("cnt"))
