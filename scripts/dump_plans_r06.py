#!/usr/bin/env python
"""Dump .explain("formatted") plans for the r06-optimized bench queries.

Usage: python scripts/dump_plans_r06.py <suffix> [query ...]
Writes plans/r06/<query>_<suffix>.txt for each bench-shaped query frame
(suffix = "before" on the round-start tree, "after" on the optimized one).

Frames are built exactly as bench.py builds them (same inputs, same
arguments, sf from $SPARK_GRAFT_SF_DIR). Iterative kernels execute their
eager localCheckpoints while the frame is constructed, so their dumped
plan shows the final readout above the checkpointed state (LogicalRDD) —
the per-superstep restructuring for those kernels is evidenced by the
code diff and the bench numbers; the map-shaped queries (the LSH/signature
family) show the full before/after plan difference directly in these files.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def main() -> None:
    suffix = sys.argv[1]
    only = set(sys.argv[2:])

    from pyspark.sql import functions as F

    from bench import _n_pages, _sf_of, build_graph
    from tric_spark import graph
    from tric_spark.operators import dedup, similarity
    from tric_spark.operators.anf import hyper_anf
    from tric_spark.operators.betweenness import betweenness_approx
    from tric_spark.operators.hits import hits
    from tric_spark.operators.louvain import louvain_move
    from tric_spark.operators.matching import maximal_matching
    from tric_spark.operators.semdedup import semantic_dedup, semantic_pairs
    from tric_spark.operators.spectral import spectral_bipartition
    from tric_spark.operators.trustrank import trusted_seed_hosts, trustrank
    from tric_spark.session import get_spark
    from tric_spark.sources.tables import load_table

    spark = get_spark(app_name="dump-plans-r06", cores=32,
                      shuffle_partitions=64)
    n_pages = _n_pages(_sf_of(SF_DIR))
    canon, sym, deg, oriented, m = build_graph(spark, n_pages)
    verts = graph.vertices(sym).cache()
    verts.count()
    docs = load_table(spark, SF_DIR, "documents")
    emb = load_table(spark, SF_DIR, "embeddings")
    piv = verts.filter(F.col("vid") % 4001 == 0)
    seeds = trusted_seed_hosts(verts)
    canon_w = canon.withColumn("weight", F.lit(1.0))

    frames = {
        "embedding_neardup": lambda: similarity.embedding_neardup_pairs(
            emb, threshold=0.4
        ),
        "dedup_minhash_lsh": lambda: dedup.lsh_candidate_pairs(docs),
        "simhash_candidates": lambda: dedup.simhash_candidates(docs),
        "neardup_groups": lambda: dedup.neardup_groups(docs, threshold=0.8),
        "semantic_dedup_pairs": lambda: semantic_pairs(
            emb, threshold=0.4, n_centroids=16
        ),
        "semantic_dedup": lambda: semantic_dedup(
            emb, threshold=0.4, n_centroids=16
        ),
        "spectral4": lambda: spectral_bipartition(sym, iters=4),
        "betweenness": lambda: betweenness_approx(sym, verts, piv, max_depth=8),
        "maximal_matching": lambda: maximal_matching(canon),
        "hits5": lambda: hits(canon, verts, tol=0.0, max_iter=5),
        "louvain2": lambda: louvain_move(sym, rounds=2),
        "trustrank5": lambda: trustrank(
            canon_w, verts, seeds, tol=0.0, max_iter=5
        ),
        "anf6": lambda: hyper_anf(sym, verts, max_h=6),
    }

    outdir = os.path.join(REPO, "plans", "r06")
    os.makedirs(outdir, exist_ok=True)
    for name, build in frames.items():
        if only and name not in only:
            continue
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        print(f"dumping {path}", flush=True)
        with open(path, "w") as f:
            f.write(plan_of(build()))
    spark.stop()


if __name__ == "__main__":
    main()
