"""Per-dimension embedding diagnostics — the health check run before any
of the vector operators (similarity.py LSH, pq.py quantization, spectral
projections) is trusted: dead (near-zero-variance) dimensions waste
codebook bits and break whitening; wildly uncentered dimensions dominate
cosine buckets.

Scale shape: one ``posexplode`` pass (rows × dims, the unavoidable
width), then a single map-side-combinable groupBy over ``dim`` — no
window, no collect; output cardinality = vector width.  Stats use
population stddev and are rounded to 6dp (both engines sum doubles in
different orders; 6dp absorbs the last-bit noise per the repo rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def embedding_dim_stats(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    dead_std: float = 1e-3,
) -> DataFrame:
    """(dim, n, mean, std, vmin, vmax, dead) per vector dimension
    (1-based).  ``dead`` flags std < ``dead_std``.  NULL vectors are
    skipped; jagged vectors contribute to the dims they have (n exposes
    the raggedness)."""
    ex = embeddings.filter(F.col(vec_col).isNotNull()).select(
        F.posexplode(F.col(vec_col)).alias("pos", "val")
    )
    return (
        ex.select(
            (F.col("pos") + 1).alias("dim"), F.col("val").cast("double").alias("v")
        )
        .groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("v"), 6).alias("mean"),
            F.round(F.stddev_pop("v"), 6).alias("std"),
            F.round(F.min("v"), 6).alias("vmin"),
            F.round(F.max("v"), 6).alias("vmax"),
        )
        .withColumn("dead", F.col("std") < F.lit(dead_std))
    )


def whiten_embeddings(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(vec_id, dim, w) long-format whitened embeddings:
    w = (val − mean_d)/std_d per dimension — the standardization PQ/IVF
    codebooks and Mahalanobis-ish metrics assume.  Dead dimensions
    (std rounds to 0 at 6dp) emit w = 0 instead of dividing by noise.

    Determinism: mean/std are 6dp-ROUNDED before use (both engines agree
    on the rounded stats — embedding_dim_stats' contract), so the
    quotient is identical IEEE arithmetic on identical inputs.  Scale
    shape: the stats groupBy output is |dims| rows, broadcast back onto
    the posexplode pass — two scans, zero shuffles of the wide data.
    """
    ex = embeddings.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("vec_id"), F.posexplode(F.col(vec_col)).alias("pos", "val")
    ).select(
        "vec_id", (F.col("pos") + 1).alias("dim"), F.col("val").cast("double").alias("v")
    )
    stats = ex.groupBy("dim").agg(
        F.round(F.avg("v"), 6).alias("mu"),
        F.round(F.stddev_pop("v"), 6).alias("sd"),
    )
    return ex.join(F.broadcast(stats), "dim").select(
        "vec_id",
        "dim",
        F.when(F.col("sd") == 0.0, F.lit(0.0))
        .otherwise(F.round((F.col("v") - F.col("mu")) / F.col("sd"), 6))
        .alias("w"),
    )


def embedding_anisotropy(
    embeddings: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """One row (n, mean_cosine) — the corpus anisotropy score: the mean
    pairwise cosine over all ordered pairs of unit-normalized vectors
    (Ethayarajh, EMNLP 2019 — contextual embeddings cluster in a narrow
    cone; mean cosine ≈ 0 is isotropic).  Closed form, NO pairwise join:
    with S = Σ uᵢ, Σ_{i≠j} uᵢ·uⱼ = ‖S‖² − n, so the whole statistic is
    one normalize pass + one per-dimension sum + one scalar fold.
    Zero-norm and NULL vectors are excluded (n reports the rest)."""
    e1 = embeddings.filter(F.col(vec_col).isNotNull()).select(
        F.col(vec_col).alias("v"),
        F.sqrt(
            F.aggregate(
                F.transform(F.col(vec_col), lambda x: x.cast("double") * x),
                F.lit(0.0),
                lambda s, x: s + x,
            )
        ).alias("nrm"),
    ).filter(F.col("nrm") > 0)
    ex = e1.select(F.posexplode("v").alias("dim", "val"), "nrm").select(
        "dim", (F.col("val").cast("double") / F.col("nrm")).alias("u")
    )
    per_dim = ex.groupBy("dim").agg(F.sum("u").alias("s"))
    s2 = per_dim.agg(F.sum(F.col("s") * F.col("s")).alias("s2"))
    nn = e1.agg(F.count(F.lit(1)).alias("n"))
    return s2.crossJoin(F.broadcast(nn)).select(
        F.col("n").cast("long").alias("n"),
        F.round(
            (F.col("s2") - F.col("n")) / (F.col("n") * (F.col("n") - 1.0)), 6
        ).alias("mean_cosine"),
    )
