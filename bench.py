#!/usr/bin/env python
"""Benchmark harness (driver-run, BENCH_r{N}.json).

Default: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], print ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
   "sf": ..., "teps": ..., "n_edges_directed": ...}

The headline workload is the north-rule pipeline at a size derived from sf:
synthesize the Common-Crawl-shaped pages/link graph deterministically
(TESTDATA tables don't include a graph; FIXTURES §2 defines this one),
then run extraction, graph build, TC (both physical paths), PageRank, CC,
LP — plus the training-pipeline ops over the driver's documents/embeddings
tables at the same sf.

--scaling: run the identical TC+PageRank job at local[8] and local[32] on
the same input and report throughput at both + scaling efficiency —
the sandbox stand-in for the north rule's N→4N-executor criterion
(BASELINE.json:2,14). Appends the evidence to BENCH.md.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.1


def _n_pages(sf: float) -> int:
    return max(2000, int(500_000 * sf))


def build_graph(spark, n_pages: int):
    """Materialized graph tables (canonical/sym/deg/oriented), cached."""
    from tric_spark import graph, synth

    edges = synth.link_edges(spark, n_pages, seed=42)
    canon = graph.canonical_edges(edges).cache()
    m = canon.count()
    sym = graph.symmetrize(canon).cache()
    sym.count()
    deg = graph.degrees(sym).cache()
    deg.count()
    oriented = graph.orient_by_degree(canon, deg).cache()
    oriented.count()
    return canon, sym, deg, oriented, m


def run_bench(spark, sf_dir: str, n_pages: int) -> dict:
    from pyspark.sql import functions as F

    from tric_spark import graph, synth
    from tric_spark.extract import outlink_edges
    from tric_spark.operators import dedup, similarity, tc
    from tric_spark.operators.cc import connected_components
    from tric_spark.operators.lp import label_propagation
    from tric_spark.operators.pagerank import pagerank
    from tric_spark.sources.doc_graph import doc_edges
    from tric_spark.sources.tables import load_table

    times: dict[str, float] = {}
    loads: dict[str, float] = {}

    def timed(name, fn, repeat=2):
        """best-of-``repeat`` steady-state timing (same methodology as
        --scaling, documented in BENCH.md): the first execution of a plan
        pays one-time Janino codegen + JIT costs that a long-lived job
        amortizes to nothing and that this shared box turns into ±2-7 s of
        per-query noise; the min of two runs measures the operator.
        Inputs are cached; the kernels recompute fully on every run.

        Per-query host loadavg is captured at query start (VERDICT r3 #3:
        the shared box's co-tenants made tc_adj read +70% one round; the
        load column attributes an outlier to contention instead of leaving
        it ambiguous)."""
        loads[name] = round(os.getloadavg()[0], 1)
        out, best = None, None
        for _ in range(repeat):
            t0 = time.time()
            out = fn()
            el = time.time() - t0
            best = el if best is None else min(best, el)
        times[name] = round(best, 3)
        return out

    # warm-up: spin up Python workers + JIT once so per-query timings
    # measure the operators, not process startup (a long-lived job's steady
    # state); explicitly not counted in the reported total
    import pyarrow as pa

    def _noop(batches):
        for b in batches:
            yield pa.RecordBatch.from_arrays([pa.array([b.num_rows])], names=["n"])

    spark.range(1000).selectExpr("id as src").mapInArrow(_noop, "n long").count()
    # plan-shape warm-up: run the graph build once at 1/25 scale so the
    # single-run full-size graph_build below measures the build (scan +
    # dedupe + groupBy + orient joins), not first-compile of those plans
    for df in build_graph(spark, 2000)[:4]:
        df.unpersist()

    # extraction pipeline: html → outlinks → edge rows (pandas UDF path)
    n_extract = min(n_pages, 20_000)  # extraction sample: UDF throughput probe
    pages = synth.pages_table(spark, n_extract, seed=42)
    timed("extract_outlinks", lambda: outlink_edges(pages).count())

    loads["graph_build"] = round(os.getloadavg()[0], 1)
    t0 = time.time()
    canon, sym, deg, oriented, m = build_graph(spark, n_pages)
    times["graph_build"] = round(time.time() - t0, 3)

    verts = graph.vertices(sym).cache()
    nv = verts.count()

    tc_adj = timed("tc_adj", lambda: tc.triangle_count_adj(oriented))
    tc_adj2 = timed("tc_adj2", lambda: tc.triangle_count_adj2(oriented))
    tc_join = timed("tc_join", lambda: tc.triangle_count_join(oriented, deg=deg))
    assert tc_adj == tc_join == tc_adj2, (tc_adj, tc_join, tc_adj2)
    # the flagship: per-vertex counts on the self-adjacency kernel
    timed("tc_per_vertex", lambda: tc.triangles_per_vertex_adj2(oriented).count())
    timed("pagerank5", lambda: pagerank(sym, verts, tol=0.0, max_iter=5).count())
    # NEW r5: HITS — 5 full iterations (10 normalized half-steps) on the
    # ORIENTED table used as a directed graph (hub/auth only differ with
    # direction kept)
    from tric_spark.operators.hits import hits

    timed("hits5", lambda: hits(canon, verts, tol=0.0, max_iter=5).count())
    timed("cc_fixpoint", lambda: connected_components(sym, verts).count())
    timed("lp2", lambda: label_propagation(sym, verts, num_iter=2).count())

    # training-pipeline ops over the driver's tables at this sf
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    timed(
        "doc_graph_tc",
        lambda: tc.triangle_count_join(doc_edges(spark, sf_dir)),
    )
    # NEW r5: per-edge triangle support (the k-truss building block) —
    # one TC pass + explode + groupBy over the doc graph
    from tric_spark.operators.truss import edge_support

    timed(
        "edge_support",
        lambda: edge_support(doc_edges(spark, sf_dir)).count(),
    )
    timed(
        "dedup_minhash_lsh",
        lambda: dedup.lsh_candidate_pairs(docs).count(),
    )
    timed("dedup_exact", lambda: dedup.exact_duplicates(docs).count())
    timed("simhash_candidates", lambda: dedup.simhash_candidates(docs).count())
    timed(
        "neardup_groups",
        lambda: dedup.neardup_groups(docs, threshold=0.8).count(),
    )
    timed(
        "rgg_build",
        lambda: synth.rgg_edges(spark, min(n_pages, 100_000)).count(),
    )
    timed(
        "rmat_build",
        lambda: synth.rmat_edges(spark, 4 * n_pages, scale=18).count(),
    )
    timed(
        "ann_topk",
        lambda: similarity.ann_bruteforce_topk(
            emb, emb.filter(F.col("vec_id") < 8), k=10
        ).count(),
    )
    # the hyperplane-LSH family (r4: precomputed ±1 matrix, zero per-row
    # hashing — these two queries measure that inner loop)
    timed(
        "ann_lsh_topk",
        lambda: similarity.ann_lsh_topk(
            emb, emb.filter(F.col("vec_id") < 8), k=10
        ).count(),
    )
    timed(
        "embedding_neardup",
        lambda: similarity.embedding_neardup_pairs(emb, threshold=0.4).count(),
    )

    # NEW r5: HyperANF neighborhood function (6 hops, 16 registers as int
    # columns), md5-seeded random walks (4 hops), and the Gopher
    # repetition-metrics quality pass
    from tric_spark.operators.anf import hyper_anf
    from tric_spark.operators.repetition import repetition_metrics
    from tric_spark.operators.walks import random_walks

    timed("anf6", lambda: hyper_anf(sym, verts, max_h=6).count())
    timed("walks4", lambda: random_walks(sym, num_steps=4).count())
    timed("repetition", lambda: repetition_metrics(docs).count())

    # NEW r5 (late-round): seed-teleport weighted PageRank (TrustRank, 5
    # supersteps on the page graph — measures the (vid, rank, e)-state
    # kernel at full edge count), pivot-Brandes betweenness (~n/4001
    # pivots, depth-8 truncation — forward σ-BFS + backward δ supersteps),
    # and crawl-frontier scoring (2-iter PR on the crawled-induced doc
    # subgraph + frontier mass + per-host top-k window)
    from tric_spark.operators.betweenness import betweenness_approx
    from tric_spark.operators.frontier import (
        frontier_scores,
        frontier_topk_per_host,
    )
    from tric_spark.operators.trustrank import trusted_seed_hosts, trustrank

    seeds = trusted_seed_hosts(verts).cache()
    seeds.count()
    canon_w = canon.withColumn("weight", F.lit(1.0))
    timed(
        "trustrank5",
        lambda: trustrank(canon_w, verts, seeds, tol=0.0, max_iter=5).count(),
    )
    piv = verts.filter(F.col("vid") % 4001 == 0)
    timed(
        "betweenness",
        lambda: betweenness_approx(sym, verts, piv, max_depth=8).count(),
    )

    def _frontier():
        from tric_spark.sources.doc_graph import doc_edges_directed

        directed = doc_edges_directed(spark, sf_dir)
        crawled = docs.filter(F.col("doc_id") % 7 != 0).select(
            F.col("doc_id").alias("vid")
        )
        e_c = directed.join(crawled.withColumnRenamed("vid", "src"), "src")
        induced = e_c.join(
            crawled.withColumnRenamed("vid", "dst"), "dst"
        ).select("src", "dst")
        pr = pagerank(induced, crawled, tol=0.0, max_iter=2)
        host_map = docs.select(
            F.col("doc_id").alias("vid"), F.col("source").alias("host")
        )
        return frontier_topk_per_host(
            frontier_scores(directed, crawled, pr), host_map, k=5
        ).count()

    timed("crawl_frontier", _frontier)

    # NEW r5 (final): SemDeDup (IVF cells → in-cell cosine pairs → CC) on
    # the embeddings table, and the Gopher quality gate (token stats +
    # both repetition passes + rule composite) over the docs table
    from tric_spark.operators.quality_filter import gopher_quality_filter
    from tric_spark.operators.semdedup import semantic_dedup

    timed(
        "semantic_dedup",
        lambda: semantic_dedup(emb, threshold=0.4, n_centroids=16).count(),
    )
    timed("gopher_filter", lambda: gopher_quality_filter(docs).count())

    # NEW late-r5 session 3: the IR family over the docs table, DSIR
    # importance weights, motif counting, and maximal matching on the
    # synthetic page graph
    from tric_spark.operators.dsir import dsir_logweights
    from tric_spark.operators.matching import maximal_matching
    from tric_spark.operators.motifs import fourclique_count
    from tric_spark.operators.textsearch import bm25_topk, inverted_index

    timed("inverted_index", lambda: inverted_index(docs).count())
    timed(
        "bm25_topk",
        lambda: bm25_topk(docs, ["spark", "query", "fast"], k=20).count(),
    )
    timed(
        "dsir_weights",
        lambda: dsir_logweights(docs, F.col("lang") == "en").count(),
    )
    timed("fourclique", lambda: fourclique_count(oriented, deg=deg))
    timed("maximal_matching", lambda: maximal_matching(canon).count())

    # NEW late-r5 session 4: Lloyd k-means on the embeddings (2 supersteps
    # — measures the broadcast-crossJoin assign + posexplode update pair).
    # Borůvka MST is deliberately NOT in the headline: its cost is
    # superstep-action count (~log2(n) rounds x pick/contract/relabel
    # checkpoints ≈ 40s at sf0.01 after fusing), which would drown the
    # data-bound queries this workload tracks; the driver's sf0.01
    # correctness gate still runs it end-to-end every round.
    from tric_spark.operators.kmeans import kmeans

    timed("kmeans8", lambda: kmeans(emb, k=8, iters=2)[0].count())

    # NEW r5-final session: community moves (integer-gain Louvain),
    # incremental CC (the delta-maintenance path: label ~4% of the edges
    # back into a prelabeled graph), PQ ADC search (the memory-bound ANN
    # variant), and the hashed-classifier text pass
    from tric_spark.operators.cc import cc_incremental, connected_components
    from tric_spark.operators.classifier import classify_docs
    from tric_spark.operators.louvain import louvain_move
    from tric_spark.operators.pq import pq_search

    timed("louvain2", lambda: louvain_move(sym, rounds=2).count())

    # prelabeling is the PREVIOUS day's job — materialized outside the
    # timed region so the number is the delta-maintenance cost itself
    keep = (F.col("src") + F.col("dst")) % 25 != 0
    prev_labels = connected_components(
        graph.symmetrize(canon.filter(keep)), verts
    ).localCheckpoint(eager=True)
    timed(
        "cc_incremental",
        lambda: cc_incremental(prev_labels, canon.filter(~keep)).count(),
    )
    timed(
        "pq_search",
        lambda: pq_search(
            emb, emb.filter(F.col("vec_id") % 200 == 0), k=5
        ).count(),
    )
    timed("classify_docs", lambda: classify_docs(docs).count())

    # NEW r5-final session 7: tokenizer training (3 weighted word-type
    # BPE merges — corpus scanned once, rounds at word-type scale), the
    # spectral 2-way cut (4 deflated lazy power supersteps), and the
    # co-visitation CF wedge over the event log's JSON payload
    from tric_spark.operators.bpe import bpe_train
    from tric_spark.operators.covisit import covisitation_topk
    from tric_spark.operators.spectral import spectral_bipartition

    timed("bpe3", lambda: bpe_train(docs, rounds=3)[0].count())
    timed("spectral4", lambda: spectral_bipartition(sym, iters=4).count())
    events = load_table(spark, sf_dir, "events")
    timed("covis_topk", lambda: covisitation_topk(events, k=3).count())

    # NEW r5-final session 8: behavioral RFM grid (histogram-threshold
    # scoring over the event log), semi-supervised label spreading (2
    # clamped mass supersteps on the page graph), MMR diversified
    # re-ranking (pool-bounded greedy over the embeddings), and the
    # map-only Flesch readability pass
    from tric_spark.operators.lp import label_spreading
    from tric_spark.operators.mmr import mmr_topk
    from tric_spark.operators.rfm import rfm_segments
    from tric_spark.operators.textstats import readability

    timed("rfm_grid", lambda: rfm_segments(events).count())
    seeds = docs.filter(F.col("doc_id") % 5 == 0).select(
        F.col("doc_id").alias("vid"), F.col("lang").alias("label")
    )
    timed(
        "label_spreading2",
        lambda: label_spreading(sym, deg, seeds, num_iter=2).count(),
    )
    timed(
        "mmr3",
        lambda: mmr_topk(
            emb, emb.filter(F.col("vec_id") < 3), k=3, pool=20
        ).count(),
    )
    timed("readability", lambda: readability(docs).count())

    ne_directed = 2 * m
    total = round(sum(times.values()), 3)
    tc_time = times["tc_adj"]
    # the queries present since round 1 — comparable against BASELINE.md's
    # 55.2 s headline; round 2 added tc_per_vertex, simhash_candidates,
    # neardup_groups and rgg_build to the workload, so the grand total is
    # NOT comparable across rounds
    r1_queries = (
        "extract_outlinks", "graph_build", "tc_adj", "tc_adj2", "tc_join",
        "pagerank5", "cc_fixpoint", "lp2", "doc_graph_tc",
        "dedup_minhash_lsh", "dedup_exact", "ann_topk",
    )
    r1_subset = round(sum(times[q] for q in r1_queries if q in times), 3)
    return {
        "metric": "link_graph_bench_total_sec",
        "value": total,
        "unit": "sec",
        "timing": "best_of_2_steady_state (graph_build single-run)",
        "r1_comparable_subset_sec": r1_subset,
        "queries": times,
        "query_loadavg_start": loads,
        "sf": _sf_of(sf_dir),
        "n_pages": n_pages,
        "n_vertices": nv,
        "n_edges_directed": ne_directed,
        "triangles": tc_adj,
        "teps_tc_adj": round(ne_directed / tc_time) if tc_time else None,
    }


def scaling_job(cores: int, n_pages: int) -> dict:
    """The fixed job run at both parallelism levels: TC + 5 PageRank
    supersteps on the identical deterministic input.

    TC kernel choice (r4, measured at 49.7M directed edges, load-gated):
    the pure-JVM wedge-join kernel (`triangle_count_join`, whole-stage
    codegen SMJ) beats the Arrow/numpy self-adjacency kernel at BOTH
    parallelism levels — 2-core 150.3 s vs 163.4 s, 8-core 45.2–51.9 s vs
    59.9 s — and scales better (the Arrow kernel's per-batch numpy
    intersects saturate shared memory bandwidth: 2→8 cores inflates its
    core-seconds by ~49%, TC efficiency 0.67 vs the join kernel's
    0.72–0.83). At sf0.1 the two tie (~3.5 s); the Arrow kernel keeps its
    role as the low-constant small-graph path and the parity variant.

    Fairness rules: identical shuffle-partition count at both levels (only
    the executor-thread count differs — the cluster-size analog), a warm-up
    pass so Python-worker/JIT startup doesn't masquerade as compute (a
    100 TB job amortizes startup to nothing), best-of-2 steady-state timing.
    """
    from tric_spark import graph
    from tric_spark.operators import tc
    from tric_spark.operators.pagerank import pagerank
    from tric_spark.session import get_spark

    spark = get_spark(app_name=f"scaling-{cores}", cores=cores,
                      shuffle_partitions=64)
    try:
        canon, sym, deg, oriented, m = build_graph(spark, n_pages)
        verts = graph.vertices(sym).cache()
        verts.count()

        def job():
            t0 = time.time()
            tri = tc.triangle_count_join(oriented, deg=deg)
            t_tc = time.time() - t0
            t0 = time.time()
            pagerank(sym, verts, tol=0.0, max_iter=5).count()
            return tri, t_tc, time.time() - t0

        tri, _, _ = job()  # warm-up: spin up python workers, JIT, fill caches
        runs = []
        for _ in range(2):
            t2, t_tc, t_pr = job()
            assert t2 == tri
            runs.append((t_tc, t_pr))
        t_tc = min(r[0] for r in runs)
        t_pr = min(r[1] for r in runs)
        best = t_tc + t_pr
        return {
            "cores": cores,
            "elapsed_sec": round(best, 3),
            "tc_sec": round(t_tc, 3),
            "pr5_sec": round(t_pr, 3),
            "teps": round(2 * m / best),
            "tc_teps": round(2 * m / t_tc),
            "triangles": tri,
            "n_edges_directed": 2 * m,
        }
    finally:
        spark.stop()


def main() -> None:
    if "--scaling-job" in sys.argv:
        # child mode: one parallelism level in an isolated JVM
        cores = int(sys.argv[sys.argv.index("--scaling-job") + 1])
        n_pages = int(sys.argv[sys.argv.index("--scaling-job") + 2])
        print(json.dumps(scaling_job(cores, n_pages)))
        return

    if "--scaling" in sys.argv:
        import subprocess

        # compute must dominate fixed latency for a meaningful scaling
        # measurement — a 100 TB job is throughput-bound, so the evidence
        # job must be too
        n_pages = int(
            os.environ.get(
                "SPARK_GRAFT_SCALE_PAGES", max(_n_pages(_sf_of(SF_DIR)), 400_000)
            )
        )
        # N and 4N; this sandbox is a SHARED host (observed co-tenant load
        # average ~15 of 32 cores with nothing of ours running), so the
        # default comparison uses core counts that both fit in the idle
        # capacity. Override with SPARK_GRAFT_SCALE_CORES="8,32".
        low_c, high_c = (
            int(x) for x in os.environ.get("SPARK_GRAFT_SCALE_CORES", "2,8").split(",")
        )

        def loadavg() -> float:
            return os.getloadavg()[0]

        def wait_quiet() -> float:
            """Load-gate EACH phase, not just the start: a measured run had
            co-tenants arrive between the 2-core and 8-core phases (0.1 →
            6.9), deflating 'efficiency' to 0.54 on code that measures
            0.89 quiet. Waits up to SPARK_GRAFT_LOAD_WAIT s (default 900)
            for 1-min loadavg ≤ SPARK_GRAFT_LOAD_GATE (default 2.0), then
            proceeds regardless (recorded per-phase either way)."""
            gate = float(os.environ.get("SPARK_GRAFT_LOAD_GATE", "2.0"))
            deadline = time.time() + float(
                os.environ.get("SPARK_GRAFT_LOAD_WAIT", "900")
            )
            while loadavg() > gate and time.time() < deadline:
                time.sleep(20)
            return loadavg()

        def run_isolated(cores: int) -> dict:
            start_load = wait_quiet()
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--scaling-job", str(cores), str(n_pages)],
                capture_output=True, text=True, check=True,
            )
            r = json.loads(out.stdout.strip().splitlines()[-1])
            r["phase_loadavg_start"] = round(start_load, 1)
            return r

        # Alternating trials with per-level best-of: the 8-core phase needs
        # 8 idle cores, so a co-tenant burst that barely dents the 2-core
        # phase crushes it (measured: 8-core TC 82/103/143 s across runs
        # while 2-core stayed ~200 s) — min over alternating trials is the
        # closest observable to the uncontended machine at each level.
        trials = int(os.environ.get("SPARK_GRAFT_SCALE_TRIALS", "1"))
        load_before = loadavg()
        lows, highs = [], []
        for _ in range(trials):
            lows.append(run_isolated(low_c))
            highs.append(run_isolated(high_c))
        load_after = loadavg()

        def best(rs: list[dict]) -> dict:
            # ADVICE r3: this composite takes each metric's min across
            # alternating trials, so the reported elapsed/teps can combine
            # phases from different trials — a deliberate estimator of the
            # uncontended machine on a shared box, labeled as such in the
            # JSON; every trial's start load is recorded, not just trial 0's
            b = dict(rs[0])
            for r in rs[1:]:
                for k in ("elapsed_sec", "tc_sec", "pr5_sec"):
                    b[k] = min(b[k], r[k])
            b["elapsed_sec"] = round(b["tc_sec"] + b["pr5_sec"], 3)
            b["teps"] = round(b["n_edges_directed"] / b["elapsed_sec"])
            b["tc_teps"] = round(b["n_edges_directed"] / b["tc_sec"])
            b["n_trials"] = len(rs)
            b["trial_tc_secs"] = [r["tc_sec"] for r in rs]
            b["composite"] = "per-metric min across alternating trials"
            b["phase_loadavg_start"] = [r["phase_loadavg_start"] for r in rs]
            return b

        low, high = best(lows), best(highs)
        assert low["triangles"] == high["triangles"]
        ratio = high_c / low_c
        eff = (low["elapsed_sec"] / high["elapsed_sec"]) / ratio
        eff_tc = (low["tc_sec"] / high["tc_sec"]) / ratio
        eff_pr = (low["pr5_sec"] / high["pr5_sec"]) / ratio
        result = {
            "metric": f"scaling_efficiency_{low_c}_to_{high_c}_cores",
            "value": round(eff, 3),
            "tc_efficiency": round(eff_tc, 3),
            "pr_efficiency": round(eff_pr, 3),
            "unit": "ratio",
            "low": low,
            "high": high,
            "sf": _sf_of(SF_DIR),
            "host_loadavg_before": round(load_before, 1),
            "host_loadavg_after": round(load_after, 1),
        }
        print(json.dumps(result))
        with open(os.path.join(REPO, "BENCH.md"), "a") as f:
            f.write(
                f"\n## Scaling evidence ({time.strftime('%Y-%m-%d %H:%M')}, "
                f"sf={_sf_of(SF_DIR)}, n_pages={n_pages}, "
                f"host load before/after: {load_before:.1f}/{load_after:.1f} of 32)\n\n"
                f"| cores | TC (s) | TC TEPS | PR5 (s) | total (s) |\n|---|---|---|---|---|\n"
                f"| {low_c} (N) | {low['tc_sec']} | {low['tc_teps']} | {low['pr5_sec']} | {low['elapsed_sec']} |\n"
                f"| {high_c} (4N) | {high['tc_sec']} | {high['tc_teps']} | {high['pr5_sec']} | {high['elapsed_sec']} |\n\n"
                f"Efficiency {low_c}→{high_c} (4× cores): TC **{eff_tc:.3f}**, "
                f"PR5 **{eff_pr:.3f}**, composite **{eff:.3f}** "
                f"(north-rule target ≥ 0.8 for N→4N). Per-phase start "
                f"loads (gated ≤ 2.0): N={low['phase_loadavg_start']}, "
                f"4N={high['phase_loadavg_start']}\n"
            )
        return

    from tric_spark.session import get_spark

    # Headline load gate (VERDICT r4 #6): the r4 official record began at
    # host load 7.4/32 and three queries swung +36-39% on unchanged code.
    # Same discipline as --scaling: wait (up to SPARK_GRAFT_LOAD_WAIT s) for
    # 1-min loadavg ≤ SPARK_GRAFT_LOAD_GATE before starting; if the first
    # query still started contended (co-tenants arrived mid-wait), retry the
    # whole bench ONCE and record both attempts in the JSON.
    gate = float(os.environ.get("SPARK_GRAFT_LOAD_GATE", "2.0"))

    def wait_quiet() -> float:
        deadline = time.time() + float(os.environ.get("SPARK_GRAFT_LOAD_WAIT", "600"))
        while os.getloadavg()[0] > gate and time.time() < deadline:
            time.sleep(15)
        return os.getloadavg()[0]

    def one_attempt() -> dict:
        start_load = wait_quiet()
        spark = get_spark(app_name="tric-spark-bench", cores=CPUS,
                          shuffle_partitions=max(CPUS * 2, 32))
        try:
            r = run_bench(spark, SF_DIR, _n_pages(_sf_of(SF_DIR)))
        finally:
            spark.stop()
        r["headline_loadavg_start"] = round(start_load, 1)
        return r

    result = one_attempt()
    # judge contamination by the FIRST query's load: later values include
    # our own local[32] threads (CLAUDE.md lore)
    first_q_load = result["query_loadavg_start"].get("extract_outlinks", 0.0)
    if first_q_load > gate:
        retry = one_attempt()
        retry_load = retry["query_loadavg_start"].get("extract_outlinks", 0.0)
        # primary = the quieter attempt; the other is kept in full
        if retry_load <= first_q_load:
            retry["contended_other_attempt"] = result
            result = retry
        else:
            result["contended_other_attempt"] = retry
    print(json.dumps(result))


if __name__ == "__main__":
    main()
