"""SALSA (Stochastic Approach for Link-Structure Analysis) over the
directed link graph. [north-rule family: standard link-graph analytics
beyond the reference's TC focus]

Lempel & Moran (WWW9 / ACM TOIS 19(2), 2001): a random-walk repair of
HITS's TKC (tightly-knit community) effect. Two coupled Markov chains on
the bipartite hub/authority view of the link graph — the authority chain
steps backward along an in-link then forward along an out-link, the hub
chain the reverse — so each update is HITS's sum DIVIDED by the local
degree (a stochastic, not merely linear, operator):

    auth(v) = Σ_{u→v} hub(u)  / outdeg(u)
    hub(u)  = Σ_{u→v} auth(v) / indeg(v)

Each half-step is L1-normalized (the states are probability
distributions; on graphs where every hub has an in-linked target the walk
conserves mass and the normalization is a no-op, but dangling bipartite
ends leak mass, exactly like PageRank's dangling vertices — the explicit
normalization keeps the iterate a distribution either way). Run with
``tol=0`` for the fixed-iteration, oracle-replayable trajectory.

Spark shape per iteration — identical scale profile to HITS
(operators/hits.py), ONE shuffle per half-step: the per-endpoint degree
divisors are folded into cached weighted adjacency lists (arrays of
(nbr, 1/deg) structs built once), so each half-step is state ⋈ adjacency →
explode → map-side-combined groupBy-sum, then the L1 norm folds back in as
a broadcast 1-row aggregate — never a driver collect. Supersteps are NOT
chained and each half-step is eagerly checkpointed, for the measured r4
reason documented in hits.py (exchange reuse does not cross the norm's
BroadcastExchange boundary; the fresh-auth frame is referenced twice by
the hub half-step).

At 10^12 scale: state is 3 doubles per vertex; both shuffles co-locate
with the static adjacency partitioning; the degree divisors ship inside
the adjacency structs so no extra degree join ever runs per superstep.
Reference analog: none (tric is TC-only); SALSA is part of the standard
web-ranking toolbox this engine's SURVEY §2.5 north-rule family covers
alongside PageRank/HITS/TrustRank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salsa(
    directed: DataFrame,
    vertices: DataFrame,
    tol: float = 1e-6,
    max_iter: int = 50,
) -> DataFrame:
    """(vid, hub, auth) after SALSA power iteration. ``directed`` is the
    deduped directed link graph (src, dst); ``vertices`` the full vertex
    set (vid).

    Init hub = auth = 1/n (unit L1 mass — the states are distributions).
    ``tol > 0``: stop when max(|Δhub|, |Δauth|) < tol across an iteration
    (one scalar driver action per iteration). ``tol = 0``: run exactly
    ``max_iter`` iterations — the oracle-replayable mode.

    Vertices with no in-links have auth 0; with no out-links hub 0. An
    edgeless graph stays all-zero via the same nullif→1.0 norm floor as
    HITS (no NaNs).
    """
    n_b = vertices.count()
    if n_b == 0:
        return vertices.withColumn("hub", F.lit(0.0)).withColumn("auth", F.lit(0.0))
    edges = directed.select("src", "dst")
    # weighted adjacency lists: the degree divisor attaches to the SUMMED
    # endpoint's degree (auth sums hub/outdeg(u) over u→v; hub sums
    # auth/indeg(v)), i.e. to the adjacency OWNER's degree — a plain
    # count(*) per owner folded into each struct, built once and cached.
    out_adj = (
        edges.groupBy(F.col("src").alias("vid"))
        .agg(F.collect_list("dst").alias("nbrs"), F.count("*").alias("deg"))
        .select(
            "vid",
            F.transform(
                "nbrs", lambda d: F.struct(d.alias("nbr"), (F.lit(1.0) / F.col("deg")).alias("w"))
            ).alias("nbrs"),
        )
        .cache()
    )
    in_adj = (
        edges.groupBy(F.col("dst").alias("vid"))
        .agg(F.collect_list("src").alias("nbrs"), F.count("*").alias("deg"))
        .select(
            "vid",
            F.transform(
                "nbrs", lambda s: F.struct(s.alias("nbr"), (F.lit(1.0) / F.col("deg")).alias("w"))
            ).alias("nbrs"),
        )
        .cache()
    )
    out_adj.count(), in_adj.count()

    init = 1.0 / float(n_b)
    state = vertices.select(
        "vid", F.lit(init).alias("hub"), F.lit(init).alias("auth")
    ).localCheckpoint(eager=True)

    def half_step(st: DataFrame, adj: DataFrame, src_col: str, dst_col: str) -> DataFrame:
        """new ``dst_col``(nbr) = Σ over adjacency owners of
        ``src_col``(owner)/deg(owner), L1-normalized; ``src_col`` passes
        through. Zero-fill joins the checkpointed state's vid column."""
        raw = (
            adj.join(st.select("vid", src_col), "vid")
            .select(
                F.explode("nbrs").alias("e"),
                (F.col(src_col)).alias("c"),
            )
            .select(
                F.col("e.nbr").alias("vid"),
                (F.col("c") * F.col("e.w")).alias("c"),
            )
            .groupBy("vid")
            .agg(F.sum("c").alias("_raw"))
        )
        upd = st.select("vid", src_col).join(raw, "vid", "left").select(
            "vid", src_col, F.coalesce("_raw", F.lit(0.0)).alias("_raw")
        )
        nrm = upd.agg(
            F.coalesce(
                F.nullif(F.sum("_raw"), F.lit(0.0)), F.lit(1.0)
            ).alias("_n")
        )
        return upd.crossJoin(F.broadcast(nrm)).select(
            "vid", src_col, (F.col("_raw") / F.col("_n")).alias(dst_col)
        )

    for _ in range(max_iter):
        # auth from hubs/outdeg over out-adjacency, then hubs from the
        # FRESH auths/indeg over in-adjacency; mid-iteration checkpoint is
        # load-bearing (see module docstring / hits.py).
        a = half_step(state, out_adj, "hub", "auth").localCheckpoint(eager=True)
        nxt = (
            half_step(a, in_adj, "auth", "hub")
            .select("vid", "hub", "auth")
            .localCheckpoint(eager=True)
        )
        if tol > 0:
            dl = (
                state.select("vid", F.col("hub").alias("h0"), F.col("auth").alias("a0"))
                .join(nxt, "vid")
                .agg(
                    F.max(
                        F.greatest(
                            F.abs(F.col("hub") - F.col("h0")),
                            F.abs(F.col("auth") - F.col("a0")),
                        )
                    )
                )
                .collect()[0][0]
            )
            state = nxt
            if dl < tol:
                break
        else:
            state = nxt
    return state
