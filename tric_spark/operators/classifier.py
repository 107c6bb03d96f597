"""Hashed linear text-classifier INFERENCE — the fastText-style scoring
pass (Joulin et al., "Bag of Tricks for Efficient Text Classification",
EACL 2017) every production data pipeline runs to tag quality/domain/
toxicity at corpus scale. [builder-brief text-analysis family; the
model-based sibling of the rule-based quality_filter.py gate]

The model is a hashed-bag-of-words linear classifier: each token hashes
into one of ``n_buckets`` weight slots (the hashing trick — no
vocabulary shipped, bounded memory no matter the corpus), the document
score is the MEAN slot weight (length-invariant), and the probability
is the logistic of the score. Training is out of scope here (no labels
in the sandbox): weights are a deterministic pure function of the slot
id, `w[b] = (b·2654435761 mod 2000001)/1e6 − 1 ∈ [−1, 1]` (Knuth
multiplicative hash), so the DuckDB oracle replays inference exactly —
swapping in real learned weights is a one-join change (weights become a
broadcast table instead of an expression).

Scale shape: ONE explode + ONE groupBy(doc) with map-side partial mean
— the dsir.py shape; everything JVM built-ins (md5/conv/pmod/exp), no
Python anywhere. At 100 TB the classifier adds one scan-shaped pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

KNUTH = 2654435761


def _bucket(token: Column, n_buckets: int, seed: int) -> Column:
    h = F.md5(F.concat_ws(":", F.lit("clf"), F.lit(str(seed)), token))
    return F.pmod(
        F.conv(F.substring(h, 1, 12), 16, 10).cast("long"), F.lit(n_buckets)
    )


def _weight(bucket: Column) -> Column:
    """Deterministic stand-in weight in [-1, 1] — integer arithmetic
    until the final division, so both engines agree bit-for-bit."""
    return F.pmod(bucket * F.lit(KNUTH), F.lit(2_000_001)) / 1_000_000.0 - 1.0


def classify_docs(
    docs: DataFrame,
    n_buckets: int = 1024,
    seed: int = 29,
    threshold: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_tokens, score, prob, label) per non-NULL-text doc:
    score = mean hashed-slot weight over whitespace tokens (empty tokens
    from runs of spaces are dropped), prob = logistic(score) rounded
    6dp, label = prob >= threshold. Deterministic, one shuffle."""
    toks = docs.filter(F.col(text_col).isNotNull()).select(
        "doc_id", F.explode(F.split(F.col(text_col), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    w = _weight(_bucket(F.col("tok"), n_buckets, seed))
    agg = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.avg(w), 6).alias("score"),
    )
    prob = F.round(1.0 / (1.0 + F.exp(-F.col("score"))), 6)
    return agg.select(
        "doc_id",
        "n_tokens",
        "score",
        prob.alias("prob"),
        (prob >= threshold).alias("label"),
    )
