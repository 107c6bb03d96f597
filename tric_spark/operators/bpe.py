"""Distributed byte-pair-encoding merge training over the corpus.

The tokenizer-training pass of an LLM data pipeline: count word types
once from the corpus, then per merge round (1) count adjacent symbol
pairs weighted by word frequency, (2) pick the globally most frequent
pair, (3) fuse every left-to-right non-overlapping occurrence of it in
each word's symbol sequence.  This is the classic weighted word-type BPE
formulation (Sennrich et al. 2016) — the corpus is scanned exactly once;
every round after that touches only the word-TYPE table (vocabulary
scale, not corpus scale), which is what makes BPE training tractable at
100 TB: a trillion-token corpus still has only O(10^7) word types.

Spark-first shape per round:
- pair counting is one explode + one map-side-combined groupBy over the
  word-type table;
- the argmax pair is a 1-row ``orderBy().limit(1)`` broadcast
  cross-joined onto every row (the in-plan "broadcast scalar" pattern
  from pagerank's dangling fold — zero driver collects in the plan);
- the merge application is a single ``F.aggregate`` fold per word: scan
  symbols left to right, fusing ``(l, r)`` into ``l||r``.  The fused
  symbol is strictly longer than ``l``, so a plain fold naturally yields
  the standard non-overlapping semantics ("a a a" + (a,a) -> "aa a").
- word-type state is ``localCheckpoint(eager=True)`` per round — the
  round-r plan otherwise references round r-1 twice (argmax + apply) and
  recompute doubles per round.

Every step is replayable in ANSI SQL (DuckDB ``list_reduce`` with the
same fold lambda), so the whole trainer is oracle-checkable — see
``__spark_entry__.oracle_sql()['bpe_merges']``.

Reference parity: the reference engine has no tokenizer trainer; this
belongs to the training-data-pipeline family (builder brief), alongside
textstats.vocabulary (reference: tric.hpp counts wedges with the same
explode+groupBy shape, cited for the aggregation idiom only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tric_spark.operators.textstats import tokens_col

# '.' is NOT portable for char-splitting: Java regex excludes \r and \n,
# RE2 (DuckDB) excludes only \n.  The explicit class behaves identically.
_CHAR_RE = "[^\n\r]"


def word_types(docs: DataFrame) -> DataFrame:
    """(word, wc) — corpus word-type table with occurrence weights.

    The single corpus-scale pass of BPE training; everything downstream
    is vocabulary-scale."""
    return (
        docs.filter(F.col("text").isNotNull())
        .select(F.explode(tokens_col()).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )


def _adjacent_pairs(syms):
    n = F.size(syms)
    length = F.greatest(n - 1, F.lit(0))
    return F.zip_with(
        F.slice(syms, 1, length),
        F.slice(syms, 2, length),
        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
    )


def bpe_train(docs: DataFrame, rounds: int = 3) -> tuple[DataFrame, DataFrame]:
    """Train ``rounds`` BPE merges over the documents' whitespace words.

    Returns ``(merges, word_syms)``:
    - merges: (round, left, right, merged, pair_count) — one row per
      merge rule, in training order; ties broken (count desc, left asc,
      right asc) so the rule sequence is deterministic.
    - word_syms: (word, wc, syms) — the word-type table after all
      rounds, i.e. the segmentation the trained merges induce.
    """
    wt = word_types(docs)
    st = wt.select(
        "word",
        "wc",
        F.regexp_extract_all(F.col("word"), F.lit(_CHAR_RE), F.lit(0)).alias("syms"),
    ).localCheckpoint(eager=True)

    merge_frames = []
    for rnd in range(1, rounds + 1):
        top1 = (
            st.select("wc", F.explode(_adjacent_pairs(F.col("syms"))).alias("p"))
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("wc").alias("pair_count"))
            .orderBy(F.col("pair_count").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .localCheckpoint(eager=True)
        )
        merge_frames.append(
            top1.select(
                F.lit(rnd).alias("round"),
                F.col("l").alias("left"),
                F.col("r").alias("right"),
                F.concat("l", "r").alias("merged"),
                F.col("pair_count").cast("long").alias("pair_count"),
            )
        )
        # fold-apply the broadcast rule; the HOF expression is
        # instantiated exactly once in this projection (COVERAGE.md lore:
        # twin HOF instances in one select corrupt lambda variables)
        folded = F.aggregate(
            F.col("syms"),
            F.expr("cast(array() as array<string>)"),
            lambda acc, s: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.col("l"))
                & (s == F.col("r")),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1),
                    F.array(F.concat(F.col("l"), F.col("r"))),
                ),
            ).otherwise(F.concat(acc, F.array(s))),
        )
        st = (
            st.crossJoin(F.broadcast(top1.select("l", "r")))
            .select("word", "wc", folded.alias("syms"))
            .localCheckpoint(eager=True)
        )

    merges = merge_frames[0]
    for f in merge_frames[1:]:
        merges = merges.unionByName(f)
    return merges, st


def bpe_compression(docs: DataFrame, rounds: int = 3) -> DataFrame:
    """One-row corpus compression readout of the first ``rounds`` trained
    merges: (n_word_types, total_words, total_syms_before,
    total_syms_after, compression) where compression = symbols-per-corpus
    after / before (1.0 = merges bought nothing).

    The go/no-go metric a tokenizer-training pipeline reads per merge
    batch — when the marginal compression of a batch flattens, stop
    training.  Costs one aggregate over the word-TYPE table on top of
    bpe_train (the corpus is never rescanned)."""
    _, st = bpe_train(docs, rounds)
    before = F.size(
        F.regexp_extract_all(F.col("word"), F.lit(_CHAR_RE), F.lit(0))
    )
    return st.agg(
        F.count(F.lit(1)).alias("n_word_types"),
        F.sum("wc").cast("long").alias("total_words"),
        F.sum(F.col("wc") * before).cast("long").alias("total_syms_before"),
        F.sum(F.col("wc") * F.size("syms")).cast("long").alias(
            "total_syms_after"
        ),
        F.round(
            F.sum(F.col("wc") * F.size("syms"))
            / F.sum(F.col("wc") * before).cast("double"),
            6,
        ).alias("compression"),
    )
