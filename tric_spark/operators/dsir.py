"""DSIR — Data Selection with Importance Resampling (Xie et al.,
NeurIPS 2023) over hashed unigram features. [pipeline family: the
quality/selection stage between dedup and training — given a small
target corpus, score every raw doc by how target-like its token
distribution is]

Estimator: bag-of-hashed-unigrams language models for the target slice
and the full raw corpus, Laplace-smoothed over ``n_buckets`` hash
buckets; a document's importance log-weight is the mean over its token
occurrences of ln p_target(bucket) − ln p_raw(bucket). (The paper uses
the unnormalized sum; the per-token mean is the same ranking within a
length class and keeps magnitudes comparable across lengths — noted
here because the oracle replays the exact formula.)

Determinism (engine rule): bucket = md5("dsir:{seed}:{token}") first 12
hex digits mod n_buckets — a pure function, identical at any
parallelism, replayable verbatim in DuckDB (same idiom as
sketches._bucket).

Scale shape: one token explode (one scan of the corpus), ONE map-side-
combined groupBy(bucket) producing ≤ n_buckets rows carrying both the
raw count and the target count (no second pass over the target slice),
1-row totals broadcast, the ≤ n_buckets log-ratio table broadcast back
onto the exploded tokens, one groupBy(doc_id). State is O(n_buckets) no
matter the corpus size — that bound is the point at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(token: Column, n_buckets: int, seed: int) -> Column:
    h = F.md5(F.concat_ws(":", F.lit("dsir"), F.lit(str(seed)), token))
    return F.pmod(
        F.conv(F.substring(h, 1, 12), 16, 10).cast("long"), F.lit(n_buckets)
    )


def dsir_logweights(
    docs: DataFrame,
    target: Column,
    n_buckets: int = 1024,
    seed: int = 17,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_toks, logw) for every non-NULL-text doc.

    ``target`` is a boolean Column over ``docs`` selecting the target
    slice (e.g. ``F.col("lang") == "en"``). logw is rounded to 6dp (the
    engine's oracle-parity rule for floats).
    """
    base = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("doc_id"),
        target.alias("is_target"),
        F.explode(
            F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
        ).alias("token"),
    )
    bk = base.withColumn("bucket", _bucket(F.col("token"), n_buckets, seed))

    counts = bk.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("rc"),
        F.sum(F.when(F.col("is_target"), 1).otherwise(0)).alias("tc"),
    )
    totals = counts.agg(
        F.sum("rc").alias("rn"), F.sum("tc").alias("tn")
    )
    ratio = (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            (
                F.log((F.col("tc") + 1) / (F.col("tn") + n_buckets))
                - F.log((F.col("rc") + 1) / (F.col("rn") + n_buckets))
            ).alias("lr"),
        )
    )
    return (
        bk.join(F.broadcast(ratio), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            F.round(F.sum("lr") / F.count(F.lit(1)), 6).alias("logw"),
        )
    )


def dsir_select_topk(
    docs: DataFrame,
    target: Column,
    k: int,
    n_buckets: int = 1024,
    seed: int = 17,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k most target-like docs: (doc_id, n_toks, logw, rank).

    Ranks on the ROUNDED logw with doc_id as the tiebreak so the cut is
    replayable bit-for-bit by the SQL oracle (engine lore: rank on the
    rounded key).
    """
    w = dsir_logweights(
        docs, target, n_buckets=n_buckets, seed=seed,
        text_col=text_col, id_col=id_col,
    )
    # orderBy().limit(k) compiles to TakeOrderedAndProject — a distributed
    # partial top-k per partition + a k-row merge, never a single-task
    # global sort. The rank window then runs over k rows only.
    topk = w.orderBy(F.col("logw").desc(), F.col("doc_id").asc()).limit(k)
    from pyspark.sql import Window

    win = Window.orderBy(F.col("logw").desc(), F.col("doc_id").asc())
    return topk.withColumn("rank", F.row_number().over(win))


def dsir_model(
    docs: DataFrame,
    target: Column,
    n_buckets: int = 1024,
    seed: int = 17,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[dict[int, float], float, int, int]:
    """Train the bucket log-ratio model and return it DRIVER-SIDE:
    (bucket → lr map, default_lr for never-seen buckets, n_buckets, seed).

    The model is ≤ n_buckets rows NO MATTER the corpus size — collecting
    it is the hyperplane-matrix precedent (a bounded precompute that then
    ships as literals), not a driver-side data loop. ``default_lr`` is the
    exact smoothed value of an empty bucket, ln((rn+B)/(tn+B)), so scoring
    unseen tokens stays on the same formula."""
    base = docs.filter(F.col(text_col).isNotNull()).select(
        target.alias("is_target"),
        F.explode(
            F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
        ).alias("token"),
    )
    counts = (
        base.withColumn("bucket", _bucket(F.col("token"), n_buckets, seed))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("rc"),
            F.sum(F.when(F.col("is_target"), 1).otherwise(0)).alias("tc"),
        )
        .collect()
    )
    rn = sum(r["rc"] for r in counts)
    tn = sum(r["tc"] for r in counts)
    import math

    lr = {
        int(r["bucket"]): math.log((r["tc"] + 1) / (tn + n_buckets))
        - math.log((r["rc"] + 1) / (rn + n_buckets))
        for r in counts
    }
    default_lr = math.log((rn + n_buckets) / (tn + n_buckets))
    return lr, default_lr, n_buckets, seed


def dsir_score_expr(
    model: tuple[dict[int, float], float, int, int],
    text_col: str = "text",
) -> Column:
    """The per-row scoring EXPRESSION for a trained model — the streaming
    twin of :func:`dsir_logweights`: a map literal lookup per token folded
    by F.aggregate, zero joins, zero shuffles, zero state. Usable verbatim
    on a batch frame or an append-mode stream (gate at the crawler's
    mouth). NULL text scores NULL."""
    lr, default_lr, n_buckets, seed = model
    pairs: list[Column] = []
    for b, v in sorted(lr.items()):
        pairs.append(F.lit(int(b)))
        pairs.append(F.lit(float(v)))
    m = F.create_map(*pairs) if pairs else F.create_map()
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    per_tok = F.transform(
        toks,
        lambda t: F.coalesce(
            m[_bucket(t, n_buckets, seed)], F.lit(float(default_lr))
        ),
    )
    total = F.aggregate(
        per_tok, F.lit(0.0), lambda acc, x: acc + x
    )
    return F.round(total / F.size(toks), 6)
