"""Exact triangle counting — the reference's flagship query, Spark-first.

The reference implements ONE logical query in 17 physical variants
(tric.hpp, fastric.hpp, …, chashfastric.hpp; SURVEY §2.3). All collapse here
to two physical strategies over one logical plan:

1. ``triangle_count_join`` — wedge generation + edge-existence probe as two
   shuffled joins. The reference's ``MPI_Alltoallv`` of (j,k) query pairs
   (fastric.hpp:201) IS the shuffle; the sorted-adjacency membership probe
   (``check_edgelist``, tric.hpp:163–177) IS the semi-join.

2. ``triangle_count_adj`` — per-edge sorted-adjacency intersection with the
   neighbor lists shipped as Arrow arrays and intersected in vectorized
   numpy (the CSR-block path; ``fast_check_edgelist`` midpoint search,
   inbufastric.hpp:506–549, becomes ``np.intersect1d`` at block granularity).

Both use the exact-1× orientation of the recommended variant
(``-DAGGR_BUFR_INRECV``: ``global_i < j < k``, inbufastric.hpp:129–131, 192;
count returned unscaled, inbufastric.hpp:845). With ``orient_by_degree`` the
orientation key is (degree, id) instead of id — identical count, and the
per-vertex wedge count drops from O(deg²) to O(m) total, which is what makes
the plan survive hub vertices at Common-Crawl scale.

The erange pruning of the heuristic variants (hbufastric.hpp:233–235,
547–566) is reproduced as a broadcast per-vertex min/max zone-map join.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tric_spark import graph


# Measured kernel crossover (BENCH.md "Annotation (r4 ...)" table, this box):
# at 1.5M directed edges / 32 cores the Arrow self-adjacency kernel and the
# JVM wedge-join tie (~3.5 s) and the Arrow path keeps the lower constant;
# at 49.7M directed edges the JVM join wins at BOTH 2 and 8 cores (146 vs
# 163-174 s; 45-52 vs 60-76 s) and scales better (TC efficiency 0.78-0.83 vs
# 0.67) because the Arrow kernel's per-batch numpy intersects saturate shared
# memory bandwidth (core-seconds inflate ~49% from 2→8 cores). Bandwidth, not
# core count, is the binding resource, so the rule keys on TOTAL edge volume:
# below this many ORIENTED (canonical) edges auto picks the Arrow kernel,
# above it the JVM join. 2M canonical = 4M directed sits between the measured
# points with ~2.7× margin to the nearest one.
AUTO_ARROW_MAX_EDGES = 2_000_000


def pick_strategy(m: int, threshold: int = AUTO_ARROW_MAX_EDGES) -> str:
    """The measured auto rule: ``adj2`` (Arrow self-adjacency) below the
    edge-volume threshold, ``join`` (JVM wedge-join) above it. The
    reference's analog is main.cpp:199–237 choosing a physical variant per
    build; ours is data-driven from the r4 BENCH.md crossover measurements
    (see :data:`AUTO_ARROW_MAX_EDGES`)."""
    return "adj2" if m <= threshold else "join"


def _has_integral_ids(oriented: DataFrame) -> bool:
    """The Arrow/numpy kernels pack vids into int64 — 128-bit struct ids
    (graph.assign_wide_ids) can only ride the JVM paths."""
    from pyspark.sql.types import IntegralType

    return isinstance(oriented.schema["src"].dataType, IntegralType)


def triangle_count(
    oriented: DataFrame,
    strategy: str = "auto",
    deg: DataFrame | None = None,
    m: int | None = None,
) -> int:
    """Global exact triangle count with physical-strategy selection.

    ``strategy="auto"`` applies :func:`pick_strategy`'s measured rule;
    explicit values ("adj2", "adj", "join", "salted") force a kernel.
    ``deg``: pass the undirected degree table when ``oriented`` came from
    :func:`tric_spark.graph.orient_by_degree` (the join path's wedge filter
    must share the orientation order). ``m``: oriented edge count if the
    caller already knows it (skips one count()). The salted hub-split kernel
    is never auto-picked — it exists for id-oriented inputs whose hubs
    survive orientation, a property the edge count can't see. Struct
    (128-bit) ids auto-route to the JVM join kernel; forcing an Arrow
    kernel on them raises.
    """
    if strategy == "auto":
        if not _has_integral_ids(oriented):
            strategy = "join"
        else:
            strategy = pick_strategy(m if m is not None else oriented.count())
    elif strategy != "join" and not _has_integral_ids(oriented):
        raise ValueError(
            f"TC strategy {strategy!r} needs int64 vertex ids; 128-bit "
            "struct ids (assign_wide_ids) ride the 'join' kernel"
        )
    if strategy == "adj2":
        return triangle_count_adj2(oriented)
    if strategy == "adj":
        return triangle_count_adj(oriented)
    if strategy == "salted":
        return triangle_count_adj2_salted(oriented)
    if strategy == "join":
        return triangle_count_join(oriented, deg=deg)
    raise ValueError(f"unknown TC strategy {strategy!r}")


def triangles_per_vertex(
    oriented: DataFrame,
    strategy: str = "auto",
    deg: DataFrame | None = None,
    m: int | None = None,
) -> DataFrame:
    """(vid, tc) with the same measured auto rule as :func:`triangle_count`
    — the per-vertex variants ride the identical kernels and shuffles, so
    the global crossover carries over."""
    if strategy == "auto":
        if not _has_integral_ids(oriented):
            strategy = "join"
        else:
            strategy = pick_strategy(m if m is not None else oriented.count())
    elif strategy != "join" and not _has_integral_ids(oriented):
        raise ValueError(
            f"TC strategy {strategy!r} needs int64 vertex ids; 128-bit "
            "struct ids (assign_wide_ids) ride the 'join' kernel"
        )
    if strategy in ("adj2", "adj"):
        return (
            triangles_per_vertex_adj2(oriented)
            if strategy == "adj2"
            else triangles_per_vertex_adj(oriented)
        )
    if strategy == "salted":
        return triangles_per_vertex_adj2_salted(oriented)
    if strategy == "join":
        return triangles_per_vertex_join(oriented, deg=deg)
    raise ValueError(f"unknown TC strategy {strategy!r}")


def _wedges(oriented: DataFrame, deg: DataFrame | None = None) -> DataFrame:
    """All wedges (i → j, i → k) with j before k in the orientation order.

    Reference: the double loop over the sorted adjacency with n > m
    (tric.hpp:132–161). The ordering filter is the sorted-adjacency n>m
    invariant — and it MUST use the same total order the edges were oriented
    by, or the closing-edge probe misses edges stored the other way. With
    ``deg`` given, that order is (degree, id) (degree-ordered orientation);
    otherwise plain id order.
    """
    if deg is None:
        e1 = oriented.select(F.col("src").alias("i"), F.col("dst").alias("j"))
        e2 = oriented.select(F.col("src").alias("i"), F.col("dst").alias("k"))
        return e1.join(e2, "i").filter(F.col("j") < F.col("k"))
    ed = oriented.join(
        deg.select(F.col("vid").alias("dst"), F.col("degree")), "dst"
    )
    e1 = ed.select(F.col("src").alias("i"), F.col("dst").alias("j"), F.col("degree").alias("jd"))
    e2 = ed.select(F.col("src").alias("i"), F.col("dst").alias("k"), F.col("degree").alias("kd"))
    return (
        e1.join(e2, "i")
        .filter(F.struct("jd", "j") < F.struct("kd", "k"))
        .select("i", "j", "k")
    )


def triangles_join(
    oriented: DataFrame, prune: bool = False, deg: DataFrame | None = None
) -> DataFrame:
    """All triangles (i, j, k) — one row per triangle, exactly once.

    ``deg``: pass the undirected degree table when ``oriented`` came from
    :func:`tric_spark.graph.orient_by_degree`, so the wedge ordering matches
    the orientation order.

    ``prune=True`` adds the reference's edge-range heuristic
    (hbufastric.hpp:233–235): wedges whose k falls outside j's neighbor
    min/max zone-map cannot close, so they are dropped *before* the probe
    shuffle via a broadcast stats join.
    """
    wedges = _wedges(oriented, deg=deg)
    if prune:
        stats = graph.vertex_stats(oriented).select(
            F.col("src").alias("j"), "min_nbr", "max_nbr"
        )
        wedges = wedges.join(F.broadcast(stats), "j").filter(
            F.col("k").between(F.col("min_nbr"), F.col("max_nbr"))
        ).select("i", "j", "k")
    probe = oriented.select(F.col("src").alias("j"), F.col("dst").alias("k"))
    # Semi-join = the edge-existence probe; each wedge matches at most once
    # (edges are deduped), so the count is exact with no /3 rescale.
    return wedges.join(probe, ["j", "k"], "left_semi").select("i", "j", "k")


def triangle_count_join(
    oriented: DataFrame, prune: bool = False, deg: DataFrame | None = None
) -> int:
    return triangles_join(oriented, prune=prune, deg=deg).count()


def triangles_per_vertex_join(oriented: DataFrame, deg: DataFrame | None = None) -> DataFrame:
    """(vid, tc) — per-vertex triangle participation counts, exact.

    Vertices in no triangle are absent (join with the vertex set to
    zero-fill if needed)."""
    tri = triangles_join(oriented, deg=deg)
    corners = tri.select(F.explode(F.array("i", "j", "k")).alias("vid"))
    return corners.groupBy("vid").agg(F.count("*").alias("tc"))


# ---------------------------------------------------------------------------
# CSR-block / Arrow path
# ---------------------------------------------------------------------------


def _intersect_pairs(
    idx_a: np.ndarray, val_a: np.ndarray, idx_b: np.ndarray, val_b: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Set-intersect two (edge_index, vertex) pair collections, vectorized.

    Each side holds the flattened adjacency lists of one endpoint of every
    edge in the batch, tagged with the edge's row index. A pair present on
    both sides = a closed wedge = a triangle. This is the whole-batch
    vectorized form of the reference's per-query sorted scan
    (check_edgelist, tric.hpp:163–177) — one numpy sort-merge instead of
    millions of per-wedge probes.

    Pairs are packed into single int64 keys (row_index * n_distinct_values
    + value_code from np.unique) so the intersection is a SIMD int64 sort —
    ~20× faster than structured-dtype comparison.
    """
    if idx_a.size == 0 or idx_b.size == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e
    allv = np.concatenate([val_a, val_b])
    uniq, codes = np.unique(allv, return_inverse=True)
    k = np.int64(uniq.size)
    ka = idx_a * k + codes[: val_a.size]
    kb = idx_b * k + codes[val_a.size :]
    # adjacency lists are deduped → keys unique per side
    common, a_idx, _ = np.intersect1d(ka, kb, assume_unique=True, return_indices=True)
    return idx_a[a_idx], val_a[a_idx]


def _flatten(col: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Flatten a Series of int arrays → (row_index_repeated, values)."""
    lens = np.fromiter((0 if v is None else len(v) for v in col), dtype=np.int64, count=len(col))
    idx = np.repeat(np.arange(len(col), dtype=np.int64), lens)
    if idx.size == 0:
        return idx, np.empty(0, dtype=np.int64)
    vals = np.concatenate([np.asarray(v, dtype=np.int64) for v in col if v is not None and len(v)])
    return idx, vals


def _flatten_arrow(list_arr) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy flatten of an Arrow ListArray → (row_index_repeated, values).

    The Arrow list layout IS a CSR block (offsets + values) — this is where
    the reference's edge_indices_/edge_list_ CSR slices (graph.hpp:319–320)
    live in our engine: no per-row Python, no copies beyond the np.repeat.
    """
    lens = list_arr.value_lengths().fill_null(0).to_numpy().astype(np.int64)
    idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    vals = list_arr.flatten().to_numpy().astype(np.int64, copy=False)
    return idx, vals


def _edges_with_adjacency(oriented: DataFrame) -> DataFrame:
    """Join every oriented edge with the out-adjacency of both endpoints.

    The src-side join is co-partitioned with the adjacency build (both hash
    on src → one shuffle reused); the dst-side join ships each adjacency
    list once per in-edge — the Spark analog of the reference's ghost-edge
    query traffic, but batched columnar (Arrow) instead of per-query
    messages.
    """
    adj = graph.adjacency(oriented)
    return (
        oriented.join(adj.withColumnRenamed("nbrs", "src_nbrs"), "src")
        .join(
            adj.select(F.col("src").alias("dst"), F.col("nbrs").alias("dst_nbrs")),
            "dst",
            "inner",  # edges whose dst has no out-neighbors close no wedge
        )
        .select("src", "dst", "src_nbrs", "dst_nbrs")
    )


def triangles_per_vertex_adj(oriented: DataFrame) -> DataFrame:
    """(vid, tc) via the two-join CSR/Arrow kernel. Exact; matches the join
    path. The per-batch corner-credit partials are the reference's local
    counters before MPI_Reduce (tric.hpp:215–216)."""
    partials = _per_vertex_two_sided(_edges_with_adjacency(oriented))
    return partials.groupBy("vid").agg(F.sum("partial").alias("tc"))


def triangle_count_approx(
    oriented: DataFrame, p: float = 0.1, seed: int = 42
) -> float:
    """DOULION-style approximate TC: keep each edge with probability p
    (deterministic xxhash64 coin, reproducible at any parallelism), count
    triangles on the sparsified graph, scale by 1/p³. Unbiased; variance
    shrinks with graph size.

    Parity note: the reference's hash variants answer probes from a Bloom
    filter and silently over-count (hashfastric.hpp:56, SURVEY §2.3 #14).
    We keep EXACT as the default everywhere; this operator is the honest
    probabilistic counterpart — explicitly approximate, never the default.
    """
    if p <= 0.0:
        # ADVICE r3: p=0 keeps nothing → 0/(0³) ZeroDivisionError; negative
        # p is nonsensical — reject both rather than divide by zero
        raise ValueError(f"triangle_count_approx needs 0 < p (got {p})")
    if p >= 1.0:
        # keep-everything degenerates to the exact count (and p·2^63 would
        # overflow the Java long literal)
        return float(triangle_count_adj(oriented))
    threshold = int(p * (2**63))
    sampled = oriented.filter(
        F.abs(F.xxhash64("src", "dst", F.lit(seed))) < F.lit(threshold)
    )
    return triangle_count_adj(sampled) / (p**3)


def local_clustering(oriented: DataFrame, deg: DataFrame) -> DataFrame:
    """(vid, tc, degree, lcc) — local clustering coefficient
    lcc = tc / C(degree, 2) for degree ≥ 2 vertices, rounded 6dp."""
    pv = triangles_per_vertex_adj2(oriented)
    return (
        deg.join(pv, "vid", "left")
        .select(
            "vid",
            F.coalesce(F.col("tc"), F.lit(0)).alias("tc"),
            "degree",
            F.round(
                F.coalesce(F.col("tc"), F.lit(0))
                / (F.col("degree") * (F.col("degree") - 1) / 2.0),
                6,
            ).alias("lcc"),
        )
        .filter(F.col("degree") >= 2)
    )


def _edges_with_dst_adjacency(oriented: DataFrame, adj: DataFrame | None = None) -> DataFrame:
    """(src, dst, dst_nbrs) — dst-side adjacency only, then re-partitioned
    and sorted by src so each partition holds every edge of its src
    vertices contiguously. The src adjacency is NOT joined or shipped: a
    vertex's out-neighbors are exactly the dst values of its own rows, which
    the kernel reconstructs in-memory from the sorted batch. Halves the
    shuffled adjacency bytes vs the two-join plan (the src side's
    Σ out_deg² duplication disappears).

    ``adj``: pass the adjacency of the FULL graph when ``oriented`` is a
    subset of it (the hybrid hub-split kernel does) — witnesses must come
    from the whole graph. Requires every edge of each src in ``oriented``
    to be present (splits must be per-src)."""
    if adj is None:
        adj = graph.adjacency(oriented)
    sp = oriented.sparkSession
    n_part = int(sp.conf.get("spark.sql.shuffle.partitions"))
    # LEFT join: edges whose dst is a sink (no out-adjacency) close no wedge
    # themselves but their dst must still appear in the reconstructed src
    # adjacency — dropping the row would undercount
    return (
        oriented.join(
            adj.select(F.col("src").alias("dst"), F.col("nbrs").alias("dst_nbrs")),
            "dst",
            "left",
        )
        .repartition(n_part, "src")
        .sortWithinPartitions("src", "dst")
        .select("src", "dst", "dst_nbrs")
    )


def _self_adjacency_flatten(src: np.ndarray, dst: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Given batch rows sorted by src, build the flattened (edge_idx,
    neighbor) pairs of each edge's SRC adjacency from the batch itself:
    for every edge i with source u, emit (i, v) for all v in A(u) = the dst
    values of u's contiguous row segment. Pure numpy."""
    if src.size == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e
    # segment boundaries of equal src runs (input sorted by src)
    boundaries = np.flatnonzero(np.diff(src)) + 1
    starts = np.concatenate([[0], boundaries]).astype(np.int64)
    ends = np.concatenate([boundaries, [src.size]]).astype(np.int64)
    seg_len = ends - starts  # out-degree of each distinct src in this batch
    # fully vectorized ragged tiling: segment s contributes seg_len[s]²
    # (row, value) pairs — row = starts[s] + p//len, value-idx = starts[s] + p%len
    sizes = seg_len * seg_len
    out_start = np.zeros(starts.size, dtype=np.int64)
    np.cumsum(sizes[:-1], out=out_start[1:])
    rep = np.repeat(np.arange(starts.size, dtype=np.int64), sizes)
    p = np.arange(int(sizes.sum()), dtype=np.int64) - out_start[rep]
    ln = seg_len[rep]
    idx = starts[rep] + p // ln
    vals = dst[starts[rep] + p % ln]
    return idx, vals


def triangles_per_vertex_adj2(oriented: DataFrame) -> DataFrame:
    """(vid, tc) — per-vertex triangle participation via the self-adjacency
    kernel: only the dst adjacency ships (the src side is reconstructed from
    the src-sorted batch), halving the shuffled adjacency bytes vs the
    two-join layout. Exact; matches :func:`triangles_per_vertex_adj`.
    Each triangle credits its three corners (base src, base dst, witness) —
    the per-vertex partials sum to 3× the global count, mirroring the
    reference's ttc/3 accounting (tric.hpp:215–217)."""
    import pyarrow as pa

    ewa = _edges_with_dst_adjacency(oriented)

    def kernel(batches):
        blist = [b for b in batches if b.num_rows]
        if blist:
            tbl = pa.Table.from_batches(blist).combine_chunks()
            src = tbl.column("src").to_numpy().astype(np.int64, copy=False)
            dst = tbl.column("dst").to_numpy().astype(np.int64, copy=False)
            ia, va = _self_adjacency_flatten(src, dst)
            ib, vb = _flatten_arrow(tbl.column("dst_nbrs").combine_chunks())
            ei, wit = _intersect_pairs(ia, va, ib, vb)
            if ei.size:
                vids, cnts = np.unique(
                    np.concatenate([src[ei], dst[ei], wit]), return_counts=True
                )
                yield pa.RecordBatch.from_arrays(
                    [pa.array(vids, pa.int64()), pa.array(cnts.astype(np.int64), pa.int64())],
                    names=["vid", "partial"],
                )

    partials = ewa.mapInArrow(kernel, schema="vid long, partial long")
    return partials.groupBy("vid").agg(F.sum("partial").alias("tc"))


def triangle_count_adj2(oriented: DataFrame) -> int:
    """Global exact TC via the self-adjacency kernel (src adjacency
    reconstructed in-batch, only dst adjacency shipped)."""
    import pyarrow as pa

    ewa = _edges_with_dst_adjacency(oriented)

    def kernel(batches):
        # one partition may arrive as several Arrow batches; a src segment
        # must not straddle them — combine the whole partition first
        blist = [b for b in batches if b.num_rows]
        total = 0
        if blist:
            tbl = pa.Table.from_batches(blist).combine_chunks()
            src = tbl.column("src").to_numpy().astype(np.int64, copy=False)
            dst = tbl.column("dst").to_numpy().astype(np.int64, copy=False)
            ia, va = _self_adjacency_flatten(src, dst)
            ib, vb = _flatten_arrow(tbl.column("dst_nbrs").combine_chunks())
            ei, _ = _intersect_pairs(ia, va, ib, vb)
            total = int(ei.size)
        yield pa.RecordBatch.from_arrays([pa.array([total], pa.int64())], names=["partial"])

    partials = ewa.mapInArrow(kernel, schema="partial long")
    row = partials.agg(F.sum("partial").alias("tc")).collect()[0]
    return int(row["tc"] or 0)


def _per_vertex_two_sided(ewa: DataFrame) -> DataFrame:
    """(vid, partial) corner credits of |src_nbrs ∩ dst_nbrs| triangles over
    a (src, dst, src_nbrs, dst_nbrs) layout — base src, base dst and the
    witness each get +1, partially aggregated per batch."""
    import pyarrow as pa

    def kernel(batches):
        for batch in batches:
            if batch.num_rows == 0:
                continue
            ia, va = _flatten_arrow(batch.column("src_nbrs"))
            ib, vb = _flatten_arrow(batch.column("dst_nbrs"))
            ei, wit = _intersect_pairs(ia, va, ib, vb)
            if ei.size == 0:
                continue
            src = batch.column("src").to_numpy().astype(np.int64, copy=False)[ei]
            dst = batch.column("dst").to_numpy().astype(np.int64, copy=False)[ei]
            vids, cnts = np.unique(np.concatenate([src, dst, wit]), return_counts=True)
            yield pa.RecordBatch.from_arrays(
                [pa.array(vids, pa.int64()), pa.array(cnts.astype(np.int64), pa.int64())],
                names=["vid", "partial"],
            )

    return ewa.mapInArrow(kernel, schema="vid long, partial long")


def derive_tau(oriented: DataFrame, c: float = 2.0, floor: int = 64) -> int:
    """Hub threshold for the split kernels, from the degree distribution:
    ``max(floor, ⌈c·√m⌉)``. Degree orientation bounds every out-degree by
    O(√m) (each of the m edges orients toward the higher-degree endpoint,
    so an out-degree above √(2m) is impossible) — any src above c·√m is
    therefore a hub that *survived* orientation (id-oriented inputs, the
    reference's global_i<j<k mode) and belongs on the 2-D grid path, while
    everything below keeps the self-adjacency path's per-task width
    bounded. One count() of the already-derived edge table; no quantile
    scan."""
    import math

    m = oriented.count()
    return max(floor, int(math.ceil(c * math.sqrt(max(m, 1)))))


def triangles_per_vertex_adj2_salted(
    oriented: DataFrame, tau: int | None = None, num_salts: int = 8
) -> DataFrame:
    """(vid, tc) — per-vertex counts with the hub-split hybrid: the flagship
    for inputs whose orientation leaves hubs with large out-degrees (see
    :func:`triangle_count_adj2_salted`). Cold srcs reconstruct their own
    adjacency in-batch; hub srcs take the 2-D grid path. Union of partials,
    one final groupBy. ``tau=None`` derives the threshold from the degree
    distribution (:func:`derive_tau`) so the hybrid engages without
    hand-tuning on id-oriented inputs."""
    import pyarrow as pa

    if tau is None:
        tau = derive_tau(oriented)
    adj = graph.adjacency(oriented)
    hot = adj.filter(F.size("nbrs") > tau).select("src")
    cold_e = oriented.join(F.broadcast(hot), "src", "left_anti")
    hot_e = oriented.join(F.broadcast(hot), "src", "left_semi")

    cold_ewa = _edges_with_dst_adjacency(cold_e, adj=adj)

    def cold_kernel(batches):
        blist = [b for b in batches if b.num_rows]
        if blist:
            tbl = pa.Table.from_batches(blist).combine_chunks()
            src = tbl.column("src").to_numpy().astype(np.int64, copy=False)
            dst = tbl.column("dst").to_numpy().astype(np.int64, copy=False)
            ia, va = _self_adjacency_flatten(src, dst)
            ib, vb = _flatten_arrow(tbl.column("dst_nbrs").combine_chunks())
            ei, wit = _intersect_pairs(ia, va, ib, vb)
            if ei.size:
                vids, cnts = np.unique(
                    np.concatenate([src[ei], dst[ei], wit]), return_counts=True
                )
                yield pa.RecordBatch.from_arrays(
                    [pa.array(vids, pa.int64()), pa.array(cnts.astype(np.int64), pa.int64())],
                    names=["vid", "partial"],
                )

    cold_partials = cold_ewa.mapInArrow(cold_kernel, schema="vid long, partial long")
    hot_partials = _per_vertex_two_sided(_grid_layout_hot(hot_e, adj, num_salts))
    return (
        cold_partials.union(hot_partials)
        .groupBy("vid")
        .agg(F.sum("partial").alias("tc"))
    )


def _count_two_sided(ewa: DataFrame) -> DataFrame:
    """One-row-per-partition partial counts of |src_nbrs ∩ dst_nbrs| over a
    (src, dst, src_nbrs, dst_nbrs) layout."""
    import pyarrow as pa

    def kernel(batches):
        total = 0
        for batch in batches:
            if batch.num_rows == 0:
                continue
            ia, va = _flatten_arrow(batch.column("src_nbrs"))
            ib, vb = _flatten_arrow(batch.column("dst_nbrs"))
            ei, _ = _intersect_pairs(ia, va, ib, vb)
            total += int(ei.size)
        yield pa.RecordBatch.from_arrays([pa.array([total], pa.int64())], names=["partial"])

    return ewa.select("src_nbrs", "dst_nbrs").mapInArrow(kernel, schema="partial long")


def triangle_count_adj(oriented: DataFrame) -> int:
    """Global exact triangle count via the CSR/Arrow kernel.

    Each triangle is found exactly once (at its base edge — the two
    orientation-smallest vertices), so the global count needs no rescale;
    the per-vertex partials count it at 3 corners (tc(v) sums to 3× the
    global count, mirroring the non-oriented variants' ttc/3,
    tric.hpp:215–217).
    """
    partials = _count_two_sided(_edges_with_adjacency(oriented))
    row = partials.agg(F.sum("partial").alias("tc")).collect()[0]
    return int(row["tc"] or 0)


def _grid_layout_hot(hot_edges: DataFrame, adj: DataFrame, num_salts: int) -> DataFrame:
    """2-D grid layout for hub srcs: both adjacencies joined, then the hub's
    edges spread over (src, hash(dst) mod num_salts) grid cells. The src
    adjacency is duplicated at most num_salts× per hub (bounded, vs the
    Σ out_deg² blowup of leaving a deg-D hub's D rows in one task). This is
    where plans/partition.py's 2-D decomposition meets an actual kernel —
    the generalization of the reference's 1-D parts_ ownership
    (graph.hpp:124–188)."""
    sp = hot_edges.sparkSession
    n_part = int(sp.conf.get("spark.sql.shuffle.partitions"))
    return (
        hot_edges.join(adj.withColumnRenamed("nbrs", "src_nbrs"), "src")
        .join(
            adj.select(F.col("src").alias("dst"), F.col("nbrs").alias("dst_nbrs")),
            "dst",
            "inner",  # sink dsts close no wedge for the global count
        )
        .withColumn("_salt", F.pmod(F.xxhash64("dst"), F.lit(num_salts)))
        .repartition(n_part, "src", "_salt")
        .select("src", "dst", "src_nbrs", "dst_nbrs")
    )


def triangle_count_adj2_salted(
    oriented: DataFrame, tau: int | None = None, num_salts: int = 8
) -> int:
    """Global exact TC, hub-split hybrid: srcs with out-degree ≤ tau ride
    the self-adjacency kernel (cheapest shuffle); srcs above tau — the hubs
    a power law guarantees — take the 2-D grid path so no single task owns
    a hub's whole out-neighborhood. Exact same count as the other kernels;
    per-edge work is independent of placement, so the split is free of
    double counting (each base edge lands in exactly one branch by its
    src's degree).

    Degree orientation already bounds out-degree by O(√m), making this
    hybrid rarely needed after `orient_by_degree`; it exists for inputs
    oriented by id (the reference's global_i < j < k mode,
    inbufastric.hpp:192) where hubs survive orientation. ``tau=None``
    derives the threshold from the degree distribution
    (:func:`derive_tau`)."""
    if tau is None:
        tau = derive_tau(oriented)
    adj = graph.adjacency(oriented)
    hot = adj.filter(F.size("nbrs") > tau).select("src")
    cold_e = oriented.join(F.broadcast(hot), "src", "left_anti")
    hot_e = oriented.join(F.broadcast(hot), "src", "left_semi")

    import pyarrow as pa

    cold_ewa = _edges_with_dst_adjacency(cold_e, adj=adj)

    def cold_kernel(batches):
        blist = [b for b in batches if b.num_rows]
        total = 0
        if blist:
            tbl = pa.Table.from_batches(blist).combine_chunks()
            src = tbl.column("src").to_numpy().astype(np.int64, copy=False)
            dst = tbl.column("dst").to_numpy().astype(np.int64, copy=False)
            ia, va = _self_adjacency_flatten(src, dst)
            ib, vb = _flatten_arrow(tbl.column("dst_nbrs").combine_chunks())
            ei, _ = _intersect_pairs(ia, va, ib, vb)
            total = int(ei.size)
        yield pa.RecordBatch.from_arrays([pa.array([total], pa.int64())], names=["partial"])

    cold_partials = cold_ewa.mapInArrow(cold_kernel, schema="partial long")
    hot_partials = _count_two_sided(_grid_layout_hot(hot_e, adj, num_salts))
    row = (
        cold_partials.union(hot_partials)
        .agg(F.sum("partial").alias("tc"))
        .collect()[0]
    )
    return int(row["tc"] or 0)


def clustering_by_degree(oriented: DataFrame, deg: DataFrame) -> DataFrame:
    """(degree, n_vertices, avg_lcc) — the c(k) curve: mean local
    clustering coefficient per degree class (Ravasz & Barabási, PRE 67,
    2003 — a power-law c(k) is the hierarchical-modularity signature every
    web-graph measurement reports next to the degree distribution).
    Composes :func:`local_clustering` (one per-vertex TC pass) with one
    map-side-combined groupBy(degree); avg over the 6dp-rounded per-vertex
    lcc (so both engines average identical inputs), re-rounded 6dp."""
    lcc = local_clustering(oriented, deg)
    return lcc.groupBy("degree").agg(
        F.count(F.lit(1)).alias("n_vertices"),
        F.round(F.avg("lcc"), 6).alias("avg_lcc"),
    )
