"""Crawl-frontier scoring: rank UNCRAWLED pages by the PageRank mass their
crawled in-linkers would push into them. [north-rule family: the classic
crawl-ordering signal for a web-scale pipeline]

Cho, Garcia-Molina & Page, "Efficient crawling through URL ordering"
(WWW 1998): ordering the frontier by (estimated) PageRank of the target
finds important pages far sooner than BFS; Abiteboul, Preda & Cobena's
OPIC (WWW 2003) runs the same idea online as "cash" flowing along links.
The batch estimator here is one PageRank step restricted to the unknown
targets: score(u) = Σ_{v crawled, v→u} rank(v)/outdeg(v), where rank is
PageRank over the crawled-induced subgraph (the only graph the crawler
has) and outdeg(v) counts ALL extracted outlinks of v (crawled or not) —
the share of v's mass that u would actually receive.

Not in the reference (tric is a triangle counter — tric.hpp:132–177);
this is web-tier engine breadth, downstream of the host/PageRank kernels.

Scale shape: frontier discovery is ONE left-anti join of the edge table
against the crawled set (shuffle on dst, AQE-skew-split); scoring is one
equi-join of edges against the n-row rank state plus one groupBy(dst)
with map-side partial aggregation; the per-host top-k is a window over
(host) — bounded per host by construction, and k rows per host leave the
exchange. No driver-side anything; at 10^12 pages every stage is a plain
co-partitioned shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def frontier_scores(
    directed: DataFrame,
    crawled: DataFrame,
    ranks: DataFrame,
) -> DataFrame:
    """(vid, score, n_inlinks) for every UNCRAWLED link target.

    ``directed``: (src, dst) page-level link edges extracted from crawled
    pages (src ∈ crawled by construction of a real crawl; enforced here by
    the join so stale edge rows cannot leak). ``crawled``: (vid) the
    crawled set. ``ranks``: (vid, rank) over the crawled pages — any
    authority score works; PageRank over the crawled-induced subgraph is
    the standard choice. score = Σ rank(src)/outdeg(src) over in-links
    from crawled pages, outdeg = ALL outlinks of src."""
    c = crawled.select("vid")
    e_c = directed.select("src", "dst").join(
        c.withColumnRenamed("vid", "src"), "src"
    )
    odeg = e_c.groupBy("src").agg(F.count("*").alias("od"))
    frontier_edges = e_c.join(
        c.withColumnRenamed("vid", "dst"), "dst", "left_anti"
    )
    return (
        frontier_edges.join(ranks.withColumnRenamed("vid", "src"), "src")
        .join(odeg, "src")
        .groupBy(F.col("dst").alias("vid"))
        .agg(
            F.sum(F.col("rank") / F.col("od")).alias("score"),
            F.count("*").alias("n_inlinks"),
        )
    )


def frontier_topk_per_host(
    scores: DataFrame,
    host_map: DataFrame,
    k: int = 5,
) -> DataFrame:
    """(host, vid, score, n_inlinks, rnk) — the k best frontier URLs per
    host: the per-host politeness budget of a real crawler (each host's
    fetch queue is rate-limited, so prioritization is per-host, not
    global). ``host_map``: (vid, host). Ordering uses the 6dp-ROUNDED
    score (desc) with vid as the tiebreak — deterministic and
    engine-portable (raw float sum order is not; CLAUDE.md rule)."""
    s = scores.join(host_map.select("vid", "host"), "vid").select(
        "host", "vid", F.round("score", 6).alias("score"), "n_inlinks"
    )
    w = Window.partitionBy("host").orderBy(
        F.col("score").desc(), F.col("vid").asc()
    )
    return (
        s.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
    )


def politeness_schedule(
    scores: DataFrame,
    host_map: DataFrame,
    per_host_rate: int = 3,
) -> DataFrame:
    """(host, vid, score, slot, wave) — the full frontier laid out into
    per-host fetch WAVES under a politeness budget of ``per_host_rate``
    fetches per host per wave: slot = rank of the URL within its host
    (6dp-rounded score desc, vid tiebreak — the portable total order),
    wave = ceil(slot / rate). Wave w is exactly "everything a polite
    crawler may fetch in round w"; max(wave) is the crawl's makespan in
    politeness rounds, dominated by the deepest host queue.

    Scale shape: one window over (host) — the same single exchange as
    the top-k variant, but emitting every row with its round number
    instead of truncating at k."""
    s = scores.join(host_map.select("vid", "host"), "vid").select(
        "host", "vid", F.round("score", 6).alias("score")
    )
    w = Window.partitionBy("host").orderBy(
        F.col("score").desc(), F.col("vid").asc()
    )
    slot = F.row_number().over(w).cast("long")
    return s.withColumn("slot", slot).withColumn(
        "wave", F.ceil(F.col("slot") / F.lit(float(per_host_rate))).cast("long")
    )


def crawl_budget(host_ranks: DataFrame, dup_rates: DataFrame) -> DataFrame:
    """(host, rank, dup_rate, weight) — per-host crawl budget allocation:
    weight ∝ host PageRank × (1 − exact-dup rate), normalized to sum 1.
    The Cho/Garcia-Molina crawl-ordering idea (WWW'98) upgraded with the
    dedup report card: authority earns budget, duplicate-heavy hosts
    forfeit it.

    ``host_ranks``: (host, rank) with rank already 6dp-ROUNDED (e.g. the
    2-iteration host_pagerank readout) — both engines then agree on the
    product exactly.  ``dup_rates``: dedup.dedup_rate_by output (key,
    ..., dup_rate).  Hosts missing a dup entry count as 0.  One broadcast
    join + one 1-row normalizer — no sort, no collect."""
    j = host_ranks.join(
        dup_rates.select(F.col("key").alias("host"), "dup_rate"),
        "host",
        "left",
    ).select(
        "host",
        "rank",
        F.coalesce("dup_rate", F.lit(0.0)).alias("dup_rate"),
        (
            F.col("rank") * (F.lit(1.0) - F.coalesce("dup_rate", F.lit(0.0)))
        ).alias("raw"),
    )
    z = j.agg(F.sum("raw").alias("z"))
    return j.crossJoin(F.broadcast(z)).select(
        "host",
        "rank",
        "dup_rate",
        F.round(F.col("raw") / F.col("z"), 6).alias("weight"),
    )
