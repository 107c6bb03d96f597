#!/usr/bin/env python
"""A/B: personalized PageRank superstep joining the checkpointed (vid, e)
state vs the legacy cached vert_e frame (VERDICT r4 #1 / r5 fix).

Runs ppr(5 supersteps, tol=0) at sf0.1 twice per variant (best-of-2,
steady-state) in ONE JVM; the legacy variant is reconstructed inline so the
comparison is same-session, same-cache. Appends nothing — prints numbers
for BENCH.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tric_spark import graph
from tric_spark.operators.pagerank import _iterate, personalized_pagerank
from tric_spark.sources.doc_graph import doc_edges
from tric_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def legacy_ppr(directed, vertices, sources, d=0.85, max_iter=5):
    """The r4 shape: per-step join against the cached vert_e frame."""
    from tric_spark.graph import out_adjacency

    n_src = sources.count()
    adj = out_adjacency(directed.select("src", "dst")).cache()
    adj.count()
    vert_e = vertices.join(
        sources.select("vid").distinct().withColumn("e", F.lit(1.0 / n_src)),
        "vid", "left",
    ).select("vid", F.coalesce("e", F.lit(0.0)).alias("e")).cache()
    vert_e.count()
    ranks = vert_e.select("vid", F.col("e").alias("rank"))

    def step(rk):
        contribs = (
            adj.join(rk, "vid")
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

    return _iterate(ranks, step, 0.0, max_iter, chain=3, check_every=1)


def main() -> None:
    spark = get_spark(app_name="ab-ppr", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
                      shuffle_partitions=64)
    canon = doc_edges(spark, SF_DIR).cache()
    canon.count()
    sym = graph.symmetrize(canon)
    verts = graph.vertices(sym).cache()
    verts.count()
    seeds = spark.createDataFrame([(0,), (1,), (2,)], "vid long")

    def run(fn):
        ts = []
        for _ in range(3):  # first run is warm-up
            t0 = time.time()
            fn().count()
            ts.append(time.time() - t0)
        return min(ts[1:])

    t_new = run(lambda: personalized_pagerank(sym, verts, seeds, tol=0.0, max_iter=5))
    t_old = run(lambda: legacy_ppr(sym, verts, seeds, max_iter=5))
    # interleave once more to damp drift
    t_new = min(t_new, run(lambda: personalized_pagerank(sym, verts, seeds, tol=0.0, max_iter=5)))
    t_old = min(t_old, run(lambda: legacy_ppr(sym, verts, seeds, max_iter=5)))
    print(f"ppr5 state-join (new): {t_new:.2f}s   cached-frame join (legacy): {t_old:.2f}s"
          f"   load: {os.getloadavg()[0]:.1f}")
    spark.stop()


if __name__ == "__main__":
    main()
