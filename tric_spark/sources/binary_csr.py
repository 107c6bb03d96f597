"""Reader for the reference's binary CSR on-disk format.

Layout (reference ``BinaryEdgeList::read``, graph.hpp:331–449):

    int64 nv | int64 ne | int64 edge_indices[nv+1]
    | { int64 tail, float64 weight } edge_list[ne]

little-endian throughout. The file stores a *symmetric* directed edge list
(every undirected edge appears in both directions), with each adjacency list
sorted ascending — the invariant every reference kernel relies on
(tric.hpp:173 "edge-list is sorted").

This is a test-fixture-scale source (karate.bin is 2.7 KB); at production
scale edges live in Iceberg/Parquet and this reader is only the bridge for
the reference's sample inputs. The decode itself is vectorized numpy — no
per-row Python.
"""

from __future__ import annotations

import struct

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

EDGE_SCHEMA = T.StructType(
    [
        T.StructField("src", T.LongType(), False),
        T.StructField("dst", T.LongType(), False),
        T.StructField("weight", T.DoubleType(), False),
    ]
)


def read_binary_csr_local(path: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode a reference binary CSR file → (src, dst, weight) numpy arrays.

    Mirrors graph.hpp:373–440: header, offsets slab, edge slab; the src of
    each half-edge is recovered by expanding the CSR offsets
    (np.repeat ≈ the reference's per-vertex edge_range loop).
    """
    with open(path, "rb") as f:
        nv, ne = struct.unpack("<qq", f.read(16))
        offsets = np.fromfile(f, dtype="<i8", count=nv + 1)
        edges = np.fromfile(f, dtype=np.dtype([("tail", "<i8"), ("w", "<f8")]), count=ne)
    degrees = np.diff(offsets)
    src = np.repeat(np.arange(nv, dtype=np.int64), degrees)
    return src, edges["tail"].astype(np.int64), edges["w"].astype(np.float64)


def write_binary_csr_local(
    path: str, src: np.ndarray, dst: np.ndarray, weight: np.ndarray, nv: int | None = None
) -> None:
    """Write (src, dst, weight) arrays in the reference's binary CSR layout
    (the sink counterpart of the loader; graph.hpp:331–344 describes the
    format). Input must be the symmetric directed edge list; rows are sorted
    (src, dst) to satisfy the sorted-adjacency invariant."""
    order = np.lexsort((dst, src))
    src, dst, weight = src[order], dst[order], weight[order]
    nv = int(nv if nv is not None else (max(src.max(), dst.max()) + 1 if src.size else 0))
    ne = int(src.size)
    counts = np.bincount(src, minlength=nv)
    offsets = np.zeros(nv + 1, dtype="<i8")
    np.cumsum(counts, out=offsets[1:])
    edges = np.empty(ne, dtype=np.dtype([("tail", "<i8"), ("w", "<f8")]))
    edges["tail"], edges["w"] = dst, weight
    with open(path, "wb") as f:
        f.write(struct.pack("<qq", nv, ne))
        offsets.tofile(f)
        edges.tofile(f)


def read_binary_csr_distributed(
    spark: SparkSession, path: str, n_chunks: int | None = None
) -> DataFrame:
    """Parallel reader for the reference binary CSR format: the vertex space
    is split into ``n_chunks`` contiguous ranges and each task performs the
    reference's per-rank slab reads itself (graph.hpp:373–434: header, its
    offsets slab at ``16 + lo·8``, then its edge slab at
    ``header + offsets + off[lo]·16``) — edges never materialize on the
    driver; the only driver IO is the 16-byte header.

    Chunking is by vertex range (the reference's default ownership,
    graph.hpp:124–158); a pathologically skewed file would want the
    balanced ``-b`` split by edge count instead (binary-searching the
    offsets slab for the chunk boundaries — same task-side read pattern).
    ``path`` must be visible to every executor (local FS here; a shared
    store at production scale)."""
    import pyarrow as pa

    with open(path, "rb") as f:
        nv, _ne = struct.unpack("<qq", f.read(16))
    if nv == 0:
        return spark.createDataFrame([], schema=EDGE_SCHEMA)
    if n_chunks is None:
        n_chunks = int(spark.sparkContext.defaultParallelism)
    n_chunks = max(1, min(int(n_chunks), int(nv)))
    edge_base = 16 + (nv + 1) * 8
    edge_dtype = np.dtype([("tail", "<i8"), ("w", "<f8")])

    def reader(batches):
        for batch in batches:
            for cid in batch.column("id").to_pylist():
                lo = cid * nv // n_chunks
                hi = (cid + 1) * nv // n_chunks  # exclusive
                if hi <= lo:
                    continue
                with open(path, "rb") as f:
                    f.seek(16 + lo * 8)
                    offsets = np.fromfile(f, dtype="<i8", count=hi - lo + 1)
                    cnt = int(offsets[-1] - offsets[0])
                    if cnt == 0:
                        continue
                    f.seek(edge_base + int(offsets[0]) * 16)
                    edges = np.fromfile(f, dtype=edge_dtype, count=cnt)
                src = np.repeat(np.arange(lo, hi, dtype=np.int64), np.diff(offsets))
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(src, pa.int64()),
                        pa.array(edges["tail"].astype(np.int64), pa.int64()),
                        pa.array(edges["w"].astype(np.float64), pa.float64()),
                    ],
                    names=["src", "dst", "weight"],
                )

    chunks = spark.range(0, n_chunks, 1, n_chunks)
    return chunks.mapInArrow(reader, schema="src long not null, dst long not null, weight double not null")


def read_binary_csr(spark: SparkSession, path: str) -> DataFrame:
    """Load a reference binary CSR file as an ``edges`` DataFrame
    ``(src long, dst long, weight double)`` — symmetric directed form,
    exactly as stored. Delegates to the distributed byte-range reader."""
    return read_binary_csr_distributed(spark, path)
