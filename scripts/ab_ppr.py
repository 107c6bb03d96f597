#!/usr/bin/env python
"""A/B evidence for VERDICT r4 #3: personalized PageRank's superstep join.

A = shipped kernel (teleport column carried INSIDE the checkpointed state;
    per-step output join targets rk.select("vid","e")).
B = the pre-fix shape (per-step output join targets the cached ``vert_e``
    vertex frame, which re-sorts its scan every chain level).

Both run 5 supersteps (tol=0) on the sf0.1 doc link graph with the same
seeds, same chain policy; correctness asserted identical (6dp) before
timing. Steady-state best-of-2 after a warm-up, same discipline as
bench.py. Appends one annotation block to BENCH.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def ppr_cached_frame(directed, vertices, sources, d=0.85, max_iter=5, chain=3,
                     check_every=1):
    """The PRE-FIX variant, reconstructed for the A/B: identical math, but
    the per-step output join targets the cached vert_e frame instead of
    the checkpointed state."""
    from tric_spark.graph import out_adjacency
    from tric_spark.operators.pagerank import _chain_policy, _iterate

    n_src = sources.count()
    edges = directed.select("src", "dst")
    adj = out_adjacency(edges).cache()
    has_dangling = adj.count() < vertices.count()
    chain, check_every = _chain_policy(has_dangling, chain, check_every)
    vert_e = vertices.join(
        sources.select("vid").distinct().withColumn("e", F.lit(1.0 / n_src)),
        "vid", "left",
    ).select("vid", F.coalesce("e", F.lit(0.0)).alias("e")).cache()
    vert_e.count()
    ranks = vert_e.select("vid", F.col("e").alias("rank"))

    def step(rk: DataFrame) -> DataFrame:
        if not has_dangling:
            contribs = (
                adj.join(rk.select("vid", "rank"), "vid")
                .select(
                    F.explode("nbrs").alias("vid"),
                    (F.col("rank") / F.col("out_deg")).alias("c"),
                )
                .groupBy("vid")
                .agg(F.sum("c").alias("in_mass"))
            )
            return vert_e.join(contribs, "vid", "left").select(
                "vid",
                (
                    F.lit(1.0 - d) * F.col("e")
                    + F.lit(d) * F.coalesce(F.col("in_mass"), F.lit(0.0))
                ).alias("rank"),
            )
        mass = (
            rk.join(adj, "vid", "left")
            .select(
                F.explode_outer("nbrs").alias("tvid"),
                F.when(F.col("out_deg").isNull(), F.col("rank"))
                .otherwise(F.col("rank") / F.col("out_deg"))
                .alias("c"),
            )
            .groupBy("tvid")
            .agg(F.sum("c").alias("in_mass"))
        )
        dang = mass.filter(F.col("tvid").isNull()).agg(
            F.coalesce(F.sum("in_mass"), F.lit(0.0)).alias("_dm")
        )
        new = vert_e.join(
            mass.withColumnRenamed("tvid", "vid"), "vid", "left"
        ).crossJoin(F.broadcast(dang))
        return new.select(
            "vid",
            (
                (F.lit(1.0 - d) + F.lit(d) * F.col("_dm")) * F.col("e")
                + F.lit(d) * F.coalesce(F.col("in_mass"), F.lit(0.0))
            ).alias("rank"),
        )

    return _iterate(ranks, step, 0.0, max_iter, chain, check_every)


def main() -> None:
    from tric_spark.operators.pagerank import personalized_pagerank
    from tric_spark.session import get_spark
    from tric_spark.sources.doc_graph import doc_edges_directed

    spark = get_spark(app_name="ab-ppr", cores=CPUS,
                      shuffle_partitions=max(CPUS * 2, 32))
    try:
        start_load = round(os.getloadavg()[0], 1)
        directed = doc_edges_directed(spark, SF_DIR).cache()
        directed.count()
        verts = (
            directed.select(F.col("src").alias("vid"))
            .union(directed.select(F.col("dst").alias("vid")))
            .distinct()
            .cache()
        )
        verts.count()
        seeds = verts.filter(F.col("vid") % 100 == 0)

        def run_a():
            return personalized_pagerank(
                directed, verts, seeds, tol=0.0, max_iter=5
            )

        def run_b():
            return ppr_cached_frame(directed, verts, seeds, max_iter=5)

        ra = {r.vid: round(r.rank, 6) for r in run_a().collect()}
        rb = {r.vid: round(r.rank, 6) for r in run_b().collect()}
        assert ra == rb, "variants diverge — A/B void"

        def best_of(fn, n=2):
            ts = []
            for _ in range(n):
                t0 = time.time()
                fn().count()
                ts.append(time.time() - t0)
            return min(ts)

        ta = best_of(run_a)
        tb = best_of(run_b)
        line = (
            f"\n## Annotation ({time.strftime('%Y-%m-%d %H:%M')}): PPR superstep "
            f"state-join A/B (sf0.1, 5 supersteps, local[{CPUS}], start load "
            f"{start_load})\n\n"
            f"Shipped (teleport column carried in checkpointed state, join vs "
            f"rk): **{ta:.2f} s**; pre-fix shape (join vs cached vert_e frame): "
            f"**{tb:.2f} s** — results identical at 6dp (asserted before "
            f"timing). VERDICT r4 #3 closed.\n"
        )
        print(line)
        with open(os.path.join(REPO, "BENCH.md"), "a") as f:
            f.write(line)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
