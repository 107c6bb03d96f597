"""Command-line parity with the reference's ``bin/tric`` binary.

A reference user runs ``mpiexec -n P bin/tric -f graph.bin`` (or ``-n V``
for a synthetic RGG); the same invocations work here against the Spark
engine:

    python -m tric_spark -f karate.bin
    python -m tric_spark -n 1000 -p 2 -l

Flag mapping (getopt string ``f:r:n:p:olbs:``, main.cpp:271–345; option
table README:51–69):

=====  ======================================================================
``-f`` input binary CSR file → the distributed byte-range reader
``-b`` balanced equal-#edges layout (find_balanced_num_edges,
       graph.hpp:453–498) → repartitionByRange; like the reference it does
       nothing (with the same warning, main.cpp:311) for synthetic inputs
``-n`` synthetic RGG vertex count (GenerateRGG, graph.hpp:626–1258)
``-p`` percent extra random edges between processes (graph.hpp:978–1164)
``-l`` distributed-LCG edge randomness: accepted for parity; this engine's
       randomness is ALWAYS the deterministic parallel-hash analog (same
       any-parallelism determinism the reference's LCG prefix provides)
``-r`` MPI I/O aggregator count (naggr, main.cpp:281) → number of parallel
       read chunks for ``-f``
``-s`` aggregate-buffer size (DEFAULT_BUF_SIZE) → accepted for parity;
       batching is Spark's shuffle manager's job (SURVEY §2.3: the 16
       buffered comm variants map to shuffle/AQE)
=====  ======================================================================

Output mirrors the reference's result sink (main.cpp:248–261): triangle
count, execution time, TEPS — as one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m tric_spark",
        description="Spark-native triangle counting with bin/tric's flags",
    )
    p.add_argument("-f", dest="file", metavar="BIN", help="input binary CSR file")
    p.add_argument("-b", dest="balanced", action="store_true",
                   help="balanced equal-#edges layout (real-world inputs only)")
    p.add_argument("-n", dest="n_vertices", type=int, metavar="V",
                   help="generate an RGG with V vertices")
    p.add_argument("-p", dest="extra_pct", type=float, default=0.0, metavar="PCT",
                   help="percent extra random edges for generated graphs")
    p.add_argument("-l", dest="lcg", action="store_true",
                   help="parity no-op: randomness is always the parallel-hash "
                        "LCG analog")
    p.add_argument("-o", dest="o_flag", action="store_true",
                   help="parity no-op (reference getopt accepts it unused)")
    p.add_argument("-r", dest="aggregators", type=int, default=None, metavar="N",
                   help="parallel read chunks for -f (MPI I/O aggregator analog)")
    p.add_argument("-s", dest="bufsize", type=int, default=None, metavar="SIZE",
                   help="parity no-op: shuffle batching is managed by Spark")
    p.add_argument("--cores", type=int, default=8, help="local[N] cores")
    p.add_argument("--shuffle-partitions", type=int, default=None)
    p.add_argument("--variant",
                   choices=("auto", "adj2", "adj", "join", "salted"),
                   default="auto",
                   help="physical TC kernel (default: auto — the measured "
                        "edge-volume rule, tc.pick_strategy; the reference "
                        "analog is main.cpp:199-237 picking a variant per "
                        "build)")
    p.add_argument("--approx", type=float, default=None, metavar="P",
                   help="DOULION edge-sampling approximate count with keep "
                        "probability P — the honest counterpart of the "
                        "reference's probabilistic Bloom variants 14/16/17 "
                        "(which over-count; exact stays the default)")
    p.add_argument("--per-vertex", action="store_true",
                   help="also compute per-vertex counts")
    p.add_argument("--out", metavar="DIR",
                   help="write per-vertex counts as parquet to DIR")
    return p


def run(args: argparse.Namespace, spark=None) -> dict:
    """Execute one bin/tric-shaped job; returns the result-sink metrics.
    ``spark`` may be injected (tests); otherwise a local session is built."""
    from tric_spark import graph, synth
    from tric_spark.operators import tc

    own_session = spark is None
    if own_session:
        from tric_spark.session import get_spark

        spark = get_spark(
            app_name="tric-spark-cli",
            cores=args.cores,
            shuffle_partitions=args.shuffle_partitions or args.cores,
        )
    try:
        if args.file:
            from tric_spark.plans.partition import repartition_balanced_by_degree
            from tric_spark.sources.binary_csr import read_binary_csr_distributed

            edges = read_binary_csr_distributed(
                spark, args.file, n_chunks=args.aggregators
            )
            canon = graph.canonical_edges(edges)
            if args.balanced:
                n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
                canon = repartition_balanced_by_degree(canon, n_part)
        elif args.n_vertices:
            if args.balanced:
                # same behavior and warning as main.cpp:311
                print(
                    "Balanced read (option -b) is only applicable for "
                    "real-world graphs. This option does nothing for "
                    "generated (synthetic) graphs.",
                    file=sys.stderr,
                )
            canon = synth.rgg_edges(
                spark, args.n_vertices, extra_edge_pct=args.extra_pct
            ).select("src", "dst")
        else:
            # main.cpp:318
            raise SystemExit("Must specify some options.")

        canon = canon.cache()
        m = canon.count()
        sym = graph.symmetrize(canon)
        deg = graph.degrees(sym)
        oriented = graph.orient_by_degree(canon, deg)

        variant = args.variant
        if variant == "auto" and args.approx is None:
            # resolve before the timer so the reported variant is the one
            # that ran (m is already counted for the TEPS sink)
            variant = tc.pick_strategy(m)
        t0 = time.time()
        if args.approx is not None:
            tri = tc.triangle_count_approx(oriented, p=args.approx)
        else:
            # the join path's wedge filter must share the orientation's
            # (deg, id) order — triangle_count threads deg through
            tri = tc.triangle_count(oriented, strategy=variant, deg=deg, m=m)
        elapsed = time.time() - t0

        approx = args.approx is not None
        result = {
            # the reference's result sink fields (main.cpp:248–261)
            "triangles": round(float(tri), 2) if approx else int(tri),
            "time_sec": round(elapsed, 3),
            "teps": round(2 * m / elapsed) if elapsed > 0 else None,
            "n_edges_directed": 2 * m,
            "variant": f"approx(p={args.approx})" if approx else variant,
        }
        if args.per_vertex or args.out:
            pv = tc.triangles_per_vertex_adj2(oriented)
            if args.out:
                pv.write.mode("overwrite").parquet(args.out)
                result["per_vertex_out"] = args.out
            result["n_vertices_with_triangles"] = pv.count()
        return result
    finally:
        if own_session:
            spark.stop()


def main(argv: list[str] | None = None, spark=None) -> dict:
    parser = build_parser()
    args = parser.parse_args(argv)
    if args.approx is not None and args.approx <= 0:
        # ADVICE r3: p=0 would ZeroDivisionError in the 1/p³ scale-up and
        # negative p is nonsensical (p ≥ 1 degenerates to exact, allowed)
        parser.error(f"--approx requires 0 < P (got {args.approx})")
    result = run(args, spark=spark)
    print(json.dumps(result))
    return result
