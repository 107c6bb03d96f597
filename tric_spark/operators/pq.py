"""Product quantization (PQ) for the ANN family — 8-bit-ish codes +
asymmetric-distance (ADC) search. [builder-brief similarity-search
family: the memory-scale path — Jégou, Douze & Schmid, "Product
Quantization for Nearest Neighbor Search", TPAMI 2011]

The vector space is split into ``n_sub`` contiguous subspaces; each
subspace gets a ``ks``-entry codebook and every vector is stored as
``n_sub`` small codes (here 8×log2(16) = 32 bits for a 64-dim float
vector — a 64× compression). Search never decodes: a query precomputes
its ks×n_sub distance table and scores candidates by summing table
lookups (ADC).

Codebooks are chosen DETERMINISTICALLY — the subvectors of the first
``ks`` vectors by id (the ivf_assignments convention, similarity.py:279)
— so the DuckDB oracle replays encode and search exactly; a k-means
refinement would drop straight in via lloyd_refine per subspace. Every
per-(sub, centroid) squared distance is 6dp-ROUNDED before any argmin
or sum (the portability rule: raw float reduction order is not portable,
CLAUDE.md).

Scale shape: encode is ONE broadcast join (ks donor rows) + a map-side
posexplode + one (vec_id, sub) partial-agg argmin — no shuffle of the
vector table beyond the groupBy; search joins the n·n_sub code rows
against a broadcast q×n_sub×ks ADC table and two-phase partial-top-ks
the sums (no single-task per-query sort — the r3 ANN rule).

Reference: not in tric (pure graph engine); the builder brief's ANN
checklist names IVF/LSH — PQ is their memory-bound companion.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(c) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return F.transform(col, lambda x: x.cast("double"))


def _sub_dist(a: Column, b: Column, s: int, sub_dim: int) -> Column:
    """6dp-rounded squared L2 distance between subvectors ``s`` of two
    equal-width vectors (1-based slice; fresh HOF lambdas per call — the
    instantiate-once rule)."""
    sa = F.slice(a, s * sub_dim + 1, sub_dim)
    sb = F.slice(b, s * sub_dim + 1, sub_dim)
    d2 = F.aggregate(
        F.zip_with(sa, sb, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return F.round(d2, 6)


def _codebook(embeddings: DataFrame, ks: int, id_col: str, vec_col: str) -> DataFrame:
    """(j, dv) — the ``ks`` donor vectors (smallest ids), j = 0-based
    rank. The limit runs over ids only; the window ranks ≤ ks rows."""
    donors = (
        embeddings.select(F.col(id_col).alias("_did"), _as_double(vec_col).alias("dv"))
        .orderBy("_did")
        .limit(ks)
    )
    w = Window.orderBy("_did")
    return donors.select((F.row_number().over(w) - 1).alias("j"), "dv")


def pq_encode(
    embeddings: DataFrame,
    n_sub: int = 8,
    ks: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, sub, code) — the PQ code of every vector, long form (one
    row per subspace; pack with ``pq_codes`` for the array view).
    code = argmin_j of the subspace distance, ties on smaller j."""
    dims_row = embeddings.select(F.size(vec_col)).first()
    dims = int(dims_row[0]) if dims_row and dims_row[0] else 0
    if dims == 0 or dims % n_sub != 0:
        raise ValueError(f"vector width {dims} not divisible by n_sub={n_sub}")
    sub_dim = dims // n_sub
    cb = _codebook(embeddings, ks, id_col, vec_col)
    e = embeddings.select(F.col(id_col).alias("vec_id"), _as_double(vec_col).alias("v"))
    dists = F.array(
        *[
            F.struct(
                F.lit(s).alias("sub"),
                _sub_dist(F.col("v"), F.col("dv"), s, sub_dim).alias("d"),
            )
            for s in range(n_sub)
        ]
    )
    long = (
        e.join(F.broadcast(cb))
        .select("vec_id", "j", F.explode(dists).alias("sd"))
        .select("vec_id", "j", F.col("sd.sub").alias("sub"), F.col("sd.d").alias("d"))
    )
    return (
        long.groupBy("vec_id", "sub")
        .agg(F.min(F.struct(F.col("d"), F.col("j"))).alias("_m"))
        .select("vec_id", "sub", F.col("_m.j").alias("code"))
    )


def pq_codes(
    embeddings: DataFrame,
    n_sub: int = 8,
    ks: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, codes array<int ordered by sub>) — the packed view."""
    enc = pq_encode(embeddings, n_sub, ks, id_col, vec_col)
    return enc.groupBy("vec_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("sub", "code"))),
            lambda x: x.code,
        ).alias("codes")
    )


def pq_search(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_sub: int = 8,
    ks: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, vec_id, adc, rank) — ADC top-k: candidates scored by
    the SUM of per-subspace query→codeword distances (6dp-rounded cells,
    6dp-rounded sum; ties on vec_id asc). Self-hits are excluded.

    The ADC table (|queries|·n_sub·ks rows) broadcasts; the big side
    ships only its n·n_sub code rows."""
    dims_row = embeddings.select(F.size(vec_col)).first()
    dims = int(dims_row[0]) if dims_row and dims_row[0] else 0
    if dims == 0 or dims % n_sub != 0:
        raise ValueError(f"vector width {dims} not divisible by n_sub={n_sub}")
    sub_dim = dims // n_sub
    cb = _codebook(embeddings, ks, id_col, vec_col)
    q = queries.select(F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qv"))
    qdists = F.array(
        *[
            F.struct(
                F.lit(s).alias("sub"),
                _sub_dist(F.col("qv"), F.col("dv"), s, sub_dim).alias("d"),
            )
            for s in range(n_sub)
        ]
    )
    adc = (
        q.join(F.broadcast(cb))
        .select("query_id", F.col("j").alias("code"), F.explode(qdists).alias("sd"))
        .select("query_id", "code", F.col("sd.sub").alias("sub"), F.col("sd.d").alias("d"))
    )
    enc = pq_encode(embeddings, n_sub, ks, id_col, vec_col)
    scored = (
        enc.join(F.broadcast(adc), ["sub", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.round(F.sum("d"), 6).alias("adc"))
    )
    # two-phase partial top-k, distance ASC (similarity._partial_topk is
    # the desc twin)
    order = [F.col("adc").asc(), F.col("vec_id").asc()]
    local = Window.partitionBy("query_id", "_pid").orderBy(*order)
    pruned = (
        scored.withColumn("_pid", F.spark_partition_id())
        .withColumn("_r", F.row_number().over(local))
        .filter(F.col("_r") <= k)
        .drop("_pid", "_r")
    )
    w = Window.partitionBy("query_id").orderBy(*order)
    return (
        pruned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "adc", "rank")
    )
