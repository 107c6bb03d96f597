"""Item co-visitation from the event log — the collaborative-filtering
candidate generator ("users who engaged with A also engaged with B").

The bipartite cousin of co-citation (operators/cocitation.py): wedges
through USERS instead of pages.  The item key is parsed from the events'
``props`` JSON payload (``$.k``) with engine-portable extraction
(Spark ``get_json_object`` ≡ DuckDB ``->>``), so this also exercises the
semi-structured column path of the source schema.

Similarity is the cosine over user sets, n_co / sqrt(n_a·n_b) — counts
come from the UNGUARDED per-item frame so denominators are exact even
when a hyperactive user is excluded from pair emission by ``max_fanout``
(the library-wide pair-bomb guard: a user who touched 10^5 items emits
C(10^5, 2) wedges and zero signal — same argument as linkpred's AA
guard; ``None`` = opt-out, skips surface via ``audit``).

100-TB shape: one distinct (user, item) pass, one self-join wedge keyed
by user (co-located), one map-side-combined pair groupBy, broadcast item
counts.  Top-k rides a per-item window over the pair table (item-pair
scale, not event scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_MAX_FANOUT = 100_000


def user_items(events: DataFrame) -> DataFrame:
    """(user_id, item) — distinct engagement pairs; item parsed from the
    props JSON ($.k)."""
    return (
        events.select(
            "user_id",
            F.get_json_object("props", "$.k").cast("long").alias("item"),
        )
        .filter(F.col("item").isNotNull() & F.col("user_id").isNotNull())
        .distinct()
    )


def covisitation(
    events: DataFrame,
    max_fanout: int | None = DEFAULT_MAX_FANOUT,
    audit: dict | None = None,
) -> DataFrame:
    """(item_a, item_b, n_co, cos) for item_a < item_b, n_co ≥ 1."""
    ui = user_items(events)
    counts = ui.groupBy("item").agg(F.count(F.lit(1)).alias("n"))
    wedge_src = ui
    if max_fanout is not None:
        fan = ui.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_items"))
        big = fan.filter(F.col("n_items") > max_fanout)
        if audit is not None:
            audit["oversized_users"] = big
        wedge_src = ui.join(big.select("user_id"), "user_id", "left_anti")
    a = wedge_src.select("user_id", F.col("item").alias("item_a"))
    b = wedge_src.select("user_id", F.col("item").alias("item_b"))
    pairs = (
        a.join(b, "user_id")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_co"))
    )
    ca = counts.select(F.col("item").alias("item_a"), F.col("n").alias("na"))
    cb = counts.select(F.col("item").alias("item_b"), F.col("n").alias("nb"))
    return (
        pairs.join(F.broadcast(ca), "item_a")
        .join(F.broadcast(cb), "item_b")
        .select(
            "item_a",
            "item_b",
            "n_co",
            F.round(
                F.col("n_co") / F.sqrt(F.col("na") * F.col("nb")), 6
            ).alias("cos"),
        )
    )


def covisitation_topk(
    events: DataFrame,
    k: int = 3,
    max_fanout: int | None = DEFAULT_MAX_FANOUT,
) -> DataFrame:
    """(item, rec, n_co, cos, rank) — top-k recommendations per item,
    ordered (n_co desc, cos desc, rec asc) so ranks are total and
    oracle-replayable; both directions of each pair are candidates."""
    pairs = covisitation(events, max_fanout)
    sym = pairs.select(
        F.col("item_a").alias("item"),
        F.col("item_b").alias("rec"),
        "n_co",
        "cos",
    ).unionByName(
        pairs.select(
            F.col("item_b").alias("item"),
            F.col("item_a").alias("rec"),
            "n_co",
            "cos",
        )
    )
    w = Window.partitionBy("item").orderBy(
        F.col("n_co").desc(), F.col("cos").desc(), F.col("rec").asc()
    )
    return (
        sym.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("item", "rec", "n_co", "cos", "rank")
    )
