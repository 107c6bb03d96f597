#!/usr/bin/env python
"""Per-query isolation bench for the r06 optimization round (guide §1.4).

NOT the driver bench — bench.py stays frozen. This harness times a chosen
subset of the bench.py workload with the same methodology (same inputs,
best-of-2 steady state, warm-up pass, per-query loadavg) so individual
optimizations can be measured without a 15-minute full run. Counting
actions match bench.py exactly; a --noop mode swaps .count() for the noop
sink (df.write.format("noop")) on the frame-returning queries to time full
materialization of every column.

Usage: python bench_extra.py q1 q2 ...      (names as in bench.py)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]

    from pyspark.sql import functions as F

    from bench import _n_pages, _sf_of, build_graph
    from tric_spark import graph
    from tric_spark.operators import dedup, similarity
    from tric_spark.session import get_spark
    from tric_spark.sources.tables import load_table

    spark = get_spark(app_name="bench-extra-r06", cores=CPUS,
                      shuffle_partitions=max(CPUS * 2, 32))
    import pyarrow as pa

    def _noop(batches):
        for b in batches:
            yield pa.RecordBatch.from_arrays([pa.array([b.num_rows])], names=["n"])

    spark.range(1000).selectExpr("id as src").mapInArrow(_noop, "n long").count()
    for df in build_graph(spark, 2000)[:4]:
        df.unpersist()

    n_pages = _n_pages(_sf_of(SF_DIR))
    canon, sym, deg, oriented, m = build_graph(spark, n_pages)
    verts = graph.vertices(sym).cache()
    verts.count()
    docs = load_table(spark, SF_DIR, "documents")
    emb = load_table(spark, SF_DIR, "embeddings")

    def frames() -> dict:
        from tric_spark.operators.anf import hyper_anf
        from tric_spark.operators.betweenness import betweenness_approx
        from tric_spark.operators.cc import connected_components
        from tric_spark.operators.hits import hits
        from tric_spark.operators.louvain import louvain_move
        from tric_spark.operators.lp import label_propagation, label_spreading
        from tric_spark.operators.matching import maximal_matching
        from tric_spark.operators.pagerank import pagerank
        from tric_spark.operators.semdedup import semantic_dedup
        from tric_spark.operators.spectral import spectral_bipartition
        from tric_spark.operators.trustrank import (
            trusted_seed_hosts,
            trustrank,
        )
        from tric_spark.operators import tc

        piv = verts.filter(F.col("vid") % 4001 == 0)
        seeds = trusted_seed_hosts(verts).cache()
        seeds.count()
        canon_w = canon.withColumn("weight", F.lit(1.0))
        lseeds = docs.filter(F.col("doc_id") % 5 == 0).select(
            F.col("doc_id").alias("vid"), F.col("lang").alias("label")
        )
        return {
            "tc_adj": lambda: tc.triangle_count_adj(oriented),
            "tc_adj2": lambda: tc.triangle_count_adj2(oriented),
            "tc_join": lambda: tc.triangle_count_join(oriented, deg=deg),
            "tc_per_vertex": lambda: tc.triangles_per_vertex_adj2(oriented).count(),
            "pagerank5": lambda: pagerank(sym, verts, tol=0.0, max_iter=5).count(),
            "hits5": lambda: hits(canon, verts, tol=0.0, max_iter=5).count(),
            "cc_fixpoint": lambda: connected_components(sym, verts).count(),
            "lp2": lambda: label_propagation(sym, verts, num_iter=2).count(),
            "dedup_minhash_lsh": lambda: dedup.lsh_candidate_pairs(docs).count(),
            "simhash_candidates": lambda: dedup.simhash_candidates(docs).count(),
            "neardup_groups": lambda: dedup.neardup_groups(
                docs, threshold=0.8
            ).count(),
            "embedding_neardup": lambda: similarity.embedding_neardup_pairs(
                emb, threshold=0.4
            ).count(),
            "semantic_dedup": lambda: semantic_dedup(
                emb, threshold=0.4, n_centroids=16
            ).count(),
            "anf6": lambda: hyper_anf(sym, verts, max_h=6).count(),
            "trustrank5": lambda: trustrank(
                canon_w, verts, seeds, tol=0.0, max_iter=5
            ).count(),
            "betweenness": lambda: betweenness_approx(
                sym, verts, piv, max_depth=8
            ).count(),
            "spectral4": lambda: spectral_bipartition(sym, iters=4).count(),
            "maximal_matching": lambda: maximal_matching(canon).count(),
            "louvain2": lambda: louvain_move(sym, rounds=2).count(),
            "label_spreading2": lambda: label_spreading(
                sym, deg, lseeds, num_iter=2
            ).count(),
        }

    fmap = frames()
    times, loads, outs = {}, {}, {}
    for name in names:
        fn = fmap[name]
        loads[name] = round(os.getloadavg()[0], 1)
        best = None
        for _ in range(2):
            t0 = time.time()
            outs[name] = fn()
            el = time.time() - t0
            best = el if best is None else min(best, el)
        times[name] = round(best, 3)
        print(json.dumps({"q": name, "sec": times[name],
                          "load_start": loads[name], "out": outs[name]}),
              flush=True)
    print(json.dumps({"metric": "bench_extra", "queries": times,
                      "query_loadavg_start": loads, "sf": _sf_of(SF_DIR)}))
    spark.stop()


if __name__ == "__main__":
    main()
