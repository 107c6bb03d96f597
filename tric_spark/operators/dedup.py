"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Design for 100 TB: every method is  (per-doc signature: narrow shuffle-free
map)  →  (groupBy signature/band: one shuffle whose key cardinality ≈ #docs)
→ (verify within candidate groups). No O(n²) stage ever materializes —
candidates come from band buckets, and only candidates are verified.

Hashing is md5-based (not xxhash64) deliberately: md5 is bit-identical
across Spark, DuckDB and every other engine, which makes the whole family
oracle-checkable, and minhash only needs *a* uniform hash. The lexicographic
MIN of md5 hex strings is a valid min-hash (uniform over the hash space).

Reference tie-in: the reference dedups edges with a linear find_if
(graph.hpp:1055–1060) and dedups queries with MapUniq (mbufastric.hpp:72–207);
exact_duplicates is the same idea as a hash groupBy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tric_spark.operators.textstats import tokens_col


def exact_duplicates(docs: DataFrame) -> DataFrame:
    """(text_hash, n_dups, min_doc_id) — exact-duplicate groups (size > 1).
    The hash groupBy form of exact dedup; keep min_doc_id as the canonical
    representative."""
    return (
        docs.groupBy(F.md5(F.col("text").cast("binary")).alias("text_hash"))
        .agg(F.count("*").alias("n_dups"), F.min("doc_id").alias("min_doc_id"))
        .filter(F.col("n_dups") > 1)
    )


def dedup_exact(docs: DataFrame) -> DataFrame:
    """Documents with exact-duplicate texts removed (min doc_id kept)."""
    keep = docs.groupBy(F.md5(F.col("text").cast("binary")).alias("h")).agg(
        F.min("doc_id").alias("doc_id")
    )
    return docs.join(keep.select("doc_id"), "doc_id", "left_semi")


def shingles_col(ngram: int = 3) -> Column:
    """Distinct token ``ngram``-shingles of ``text`` (whole text for docs
    shorter than one shingle). Shingles, not single tokens, are what make
    MinHash selective: a 31-word vocabulary yields ~16k distinct 3-shingles,
    so unrelated docs rarely share a minimum."""
    toks = tokens_col()
    n = F.size(toks)
    return F.when(n < ngram, F.array(F.col("text"))).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n - ngram + 1),
                lambda i: F.array_join(F.slice(toks, i, ngram), " "),
            )
        )
    )


def _minhash_col(k: int, ngram: int = 3) -> Column:
    """min over shingles of md5(shingle || '#k') — one permutation."""
    return F.array_min(
        F.transform(
            shingles_col(ngram),
            lambda t: F.md5(F.concat(t, F.lit(f"#{k}")).cast("binary")),
        )
    )


def minhash_signatures(docs: DataFrame, k: int = 8, ngram: int = 3) -> DataFrame:
    """(doc_id, mh0..mh{k-1}) — k-permutation MinHash signature over the
    document's token ``ngram``-shingle set."""
    return docs.select(
        "doc_id", *[_minhash_col(i, ngram).alias(f"mh{i}") for i in range(k)]
    )


def lsh_candidate_pairs(
    docs: DataFrame, k: int = 16, rows_per_band: int = 4, ngram: int = 3
) -> DataFrame:
    """(a, b) candidate near-duplicate pairs: docs sharing at least one LSH
    band (band hash = md5 of ``rows_per_band`` concatenated minhashes).

    The scale path: one groupBy per band on the band hash; a pair is
    emitted only from within a bucket, never from a cross join. With
    shingled signatures and 4-row bands a band collision needs Jaccard^4
    agreement — measured 25 candidates of 124,750 possible pairs (0.02%)
    on the sf0.01 corpus, vs 64% for the old single-token 2-row bands.
    """
    sig = minhash_signatures(docs, k, ngram)
    n_bands = k // rows_per_band
    pair_sets = []
    for b in range(n_bands):
        cols = [f"mh{b * rows_per_band + r}" for r in range(rows_per_band)]
        banded = sig.select(
            "doc_id", F.md5(F.concat(*cols).cast("binary")).alias("band")
        )
        left = banded.select(F.col("doc_id").alias("a"), "band")
        right = banded.select(F.col("doc_id").alias("b"), "band")
        pair_sets.append(
            left.join(right, "band").filter(F.col("a") < F.col("b")).select("a", "b")
        )
    out = pair_sets[0]
    for p in pair_sets[1:]:
        out = out.union(p)
    return out.dropDuplicates(["a", "b"])


def ngram_jaccard_pairs(
    docs: DataFrame, candidates: DataFrame | None = None, ngram: int = 3
) -> DataFrame:
    """(a, b, jaccard) — token n-gram Jaccard similarity, verified exactly
    for each candidate pair (from LSH by default). Round 4dp."""
    if candidates is None:
        candidates = lsh_candidate_pairs(docs)
    g = docs.select("doc_id", shingles_col(ngram).alias("grams"))
    ga = g.select(F.col("doc_id").alias("a"), F.col("grams").alias("ga"))
    gb = g.select(F.col("doc_id").alias("b"), F.col("grams").alias("gb"))
    inter = F.size(F.array_intersect("ga", "gb"))
    union = F.size(F.array_union("ga", "gb"))
    return (
        candidates.join(ga, "a")
        .join(gb, "b")
        .select(
            "a",
            "b",
            F.round(inter.cast("double") / union, 4).alias("jaccard"),
        )
    )


def simhash(docs: DataFrame, bits: int = 8) -> DataFrame:
    """(doc_id, sig) — SimHash signature as a '0'/'1' string of ``bits``
    bits. Bit p is the sign of the token-set majority vote where each
    token votes +1 iff hex digit p of md5(token) is >= 8 (its top bit).

    8 bits default keeps the oracle SQL tractable; the Spark side accepts
    any width. Near-dup detection = grouping by signature (Hamming-0) or
    banding the signature for Hamming-k."""
    toks = F.array_distinct(tokens_col())

    def bit(p: int) -> Column:
        vote = F.transform(
            toks,
            lambda t: F.when(
                F.instr(F.lit("89abcdef"), F.substring(F.md5(t.cast("binary")), p + 1, 1)) > 0,
                F.lit(1),
            ).otherwise(F.lit(-1)),
        )
        s = F.aggregate(vote, F.lit(0), lambda acc, x: acc + x)
        return F.when(s >= 0, F.lit("1")).otherwise(F.lit("0"))

    return docs.select("doc_id", F.concat(*[bit(p) for p in range(bits)]).alias("sig"))


def simhash_candidates(
    docs: DataFrame, bits: int = 16, bands: int = 4
) -> DataFrame:
    """(a, b) candidate pairs with small SimHash Hamming distance: the
    signature is split into ``bands`` contiguous bit-bands; any pair agreeing
    on at least one whole band is a candidate (catches Hamming distance
    < bands by pigeonhole). Same group-by-band scale shape as MinHash-LSH —
    never a cross join."""
    sig = simhash(docs, bits)
    width = bits // bands
    pair_sets = []
    for b in range(bands):
        banded = sig.select(
            "doc_id", F.substring("sig", b * width + 1, width).alias("band")
        )
        left = banded.select(F.col("doc_id").alias("a"), "band")
        right = banded.select(F.col("doc_id").alias("b"), "band")
        pair_sets.append(
            left.join(right, "band").filter(F.col("a") < F.col("b")).select("a", "b")
        )
    out = pair_sets[0]
    for p in pair_sets[1:]:
        out = out.union(p)
    return out.dropDuplicates(["a", "b"])


def simhash_duplicate_groups(docs: DataFrame, bits: int = 8) -> DataFrame:
    """(sig, n_docs, min_doc_id) — SimHash-identical groups with >1 doc."""
    return (
        simhash(docs, bits)
        .groupBy("sig")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("min_doc_id"))
        .filter(F.col("n_docs") > 1)
    )
