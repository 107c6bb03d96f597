"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
SIGMOD'03 — the MOSS local fingerprinting algorithm).
[training-pipeline family: position-aware overlap detection — the
guarantee-carrying cousin of MinHash: any shared substring of
k + w - 1 tokens is CAUGHT by at least one shared fingerprint]

Per document: hash every k-token gram, slide a window of w consecutive
gram hashes, and select the minimum of each window — ties broken to the
RIGHTMOST position (robust winnowing), which minimizes selections on
low-entropy runs. Selected (position, hash) pairs are the fingerprints;
density is 2/(w+1) of grams in expectation.

Not in the reference (tric has no text kernels); complements the engine's
MinHash/SimHash family: those estimate whole-document similarity, this
localizes WHERE the overlap is (the segdedup/MassiveText passage view is
the fixed-offset analog; winnowing is offset-invariant).

Spark shape — everything stays in JVM whole-stage codegen:
  * grams + hashes: one posexplode over the token array; the 48-bit gram
    hash is conv(substr(md5(gram),1,12)) — the repo's oracle-portable
    hash idiom (xxhash64 does NOT replay in DuckDB).
  * window minima: ONE window pass, frame = current row + (w-1)
    following, ordered by gram position within doc_id. The rightmost-tie
    rule is folded into the SAME pass by taking min(struct(h, -pos)) —
    struct comparison is lexicographic in both Spark and DuckDB, so the
    argmin needs no second join.
  * dedup to distinct (doc_id, pos, fp): fingerprints selected by
    overlapping windows collapse.
At 100 TB this is a map-only pass (window partitioned by doc_id — no
cross-document shuffle beyond the doc repartition) followed by one
distinct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tric_spark.operators.dedup import DEFAULT_MAX_BUCKET
from tric_spark.operators.textstats import tokens_col


def winnow_fingerprints(
    docs: DataFrame, k: int = 4, w: int = 4
) -> DataFrame:
    """(doc_id, pos, fp): robust-winnowing fingerprints of each document's
    whitespace token stream; ``pos`` is the 0-based index of the selected
    k-gram. Documents with fewer than k + w - 1 tokens yield no rows
    (no full window exists); NULL texts are filtered."""
    toks = docs.filter(F.col("text").isNotNull()).select(
        "doc_id",
        F.filter(tokens_col(), lambda t: t != F.lit("")).alias("toks"),
    )
    # sequence(0, n-k) DESCENDS when n < k (Spark defaults step to -1),
    # driving slice() to an illegal 0 start — and a separate short-doc
    # filter is NOT safe: CombineFilters+CollapseProject may inline the
    # gram expression into a reordered conjunct that evaluates first
    # (observed). The expression itself must be total, hence the CASE.
    grams = toks.select(
        "doc_id",
        F.expr(
            f"CASE WHEN size(toks) >= {k} THEN "
            f"transform(sequence(0, size(toks) - {k}), "
            f"i -> concat_ws(' ', slice(toks, i + 1, {k}))) "
            f"ELSE array() END"
        ).alias("grams"),
    ).filter(F.size("grams") >= w)
    gh = grams.select(
        "doc_id", F.posexplode("grams").alias("pos", "gram")
    ).select(
        "doc_id",
        "pos",
        F.conv(F.substring(F.md5("gram"), 1, 12), 16, 10)
        .cast("long")
        .alias("h"),
    )
    fw = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, w - 1)
    )
    sel = gh.select(
        "doc_id",
        F.min(F.struct(F.col("h"), (-F.col("pos")).alias("nj"))).over(fw).alias("m"),
        F.count(F.lit(1)).over(fw).alias("_wn"),
    ).filter(F.col("_wn") == w)
    return sel.select(
        "doc_id",
        (-F.col("m.nj")).alias("pos"),
        F.col("m.h").alias("fp"),
    ).dropDuplicates(["doc_id", "pos", "fp"])


def winnow_candidates(
    docs: DataFrame,
    k: int = 4,
    w: int = 4,
    min_shared: int = 2,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
    audit: dict | None = None,
) -> DataFrame:
    """(a, b, n_shared) document pairs sharing >= ``min_shared`` distinct
    winnowing fingerprints — the MOSS match candidates. The pair emission
    rides the engine's shared banded-groupBy guard (bucket = fingerprint
    value; ``max_bucket`` ON by default, ``None`` = opt-out) and counts
    shared fingerprints with one groupBy — never a cross join."""
    fps = winnow_fingerprints(docs, k, w).select("doc_id", "fp").distinct()
    banded = fps.select(F.col("doc_id").alias("id"), F.col("fp").alias("band"))
    if max_bucket is not None:
        sizes = banded.groupBy("band").agg(F.count("*").alias("n_ids"))
        big = sizes.filter(F.col("n_ids") > max_bucket)
        if audit is not None:
            audit["oversized_buckets"] = big.select(
                F.lit(0).alias("band_idx"), "band", "n_ids"
            )
        banded = banded.join(big.select("band"), "band", "left_anti")
    left = banded.select(F.col("id").alias("a"), "band")
    right = banded.select(F.col("id").alias("b"), "band")
    return (
        left.join(right, "band")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
