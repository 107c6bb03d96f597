"""Deterministic train/val/test splitting by content-free id hashing.
[pipeline family: the last step before training — every large-corpus
pipeline needs a split that is (a) stable under re-runs and repartitions,
(b) disjoint by construction, (c) reproducible from the id alone]

``randomSplit`` is the trap here: it samples per-partition with a seeded
RNG, so the assignment CHANGES when partitioning changes — two runs of
the same pipeline can put the same document on different sides of the
train/test wall (leakage). The engine rule applies: the split key is
md5("split:{seed}:{id}") first 12 hex digits scaled to [0,1) — a pure
function of (seed, id), identical at any parallelism, replayable
verbatim in DuckDB.

One expression per row, no shuffle, no state; the split column is a
pushdown-friendly literal comparison chain.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCALE = float(1 << 48)


def split_key(id_col: Column, seed: int = 11) -> Column:
    """Uniform [0,1) from the id — the deterministic coin."""
    h = F.md5(
        F.concat_ws(":", F.lit("split"), F.lit(str(seed)), id_col.cast("string"))
    )
    return F.conv(F.substring(h, 1, 12), 16, 10).cast("double") / F.lit(_SCALE)


def assign_split(
    docs: DataFrame,
    fractions: dict[str, float] | None = None,
    seed: int = 11,
    id_col: str = "doc_id",
) -> DataFrame:
    """Input rows + ``split`` label. ``fractions`` maps label → mass in
    DECLARATION ORDER (cumulative boundaries); must sum to 1 within 1e-9.
    """
    fractions = fractions or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    u = split_key(F.col(id_col), seed)
    expr = None
    acc = 0.0
    labels = list(fractions.items())
    for name, frac in labels[:-1]:
        acc += frac
        expr = (
            F.when(u < acc, F.lit(name))
            if expr is None
            else expr.when(u < acc, F.lit(name))
        )
    last = labels[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return docs.withColumn("split", expr)


def split_summary(
    docs: DataFrame,
    fractions: dict[str, float] | None = None,
    seed: int = 11,
    id_col: str = "doc_id",
) -> DataFrame:
    """(split, n_docs, sum_chars) — the audit view of an assignment."""
    return (
        assign_split(docs, fractions, seed, id_col)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )
