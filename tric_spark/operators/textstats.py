"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language ID, document fingerprinting.

All computed with JVM-side built-in functions (whole-stage codegen — no
Python in the hot path), and every definition is deliberately expressible
in ANSI SQL so the driver's DuckDB oracle can replay it exactly
(__spark_entry__.oracle_sql).

Tokenization is a single literal-space split — chosen because its
semantics are bit-identical between Spark's split and DuckDB/standard
string_split, which makes the whole family oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

STOPWORDS = ("the", "and", "of", "to", "a")

# deterministic marker tokens per language for the n-gram/keyword heuristic
LANG_MARKERS = {"en": "the", "de": "der", "es": "el", "fr": "le"}


def tokens_col(text: str | Column = "text") -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ", -1)


def token_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens) — whitespace token count."""
    return docs.select("doc_id", F.size(tokens_col()).alias("n_tokens"))


# BPE-style pre-tokenization: letter runs | digit runs | single symbols —
# the GPT-2-family pre-tokenizer shape, simplified to a portable regex
BPE_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def token_counts_bpe(docs: DataFrame) -> DataFrame:
    """(doc_id, n_bpe_tokens) — BPE-ish regex token count (letter runs,
    digit runs, individual symbols; whitespace dropped)."""
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_PATTERN), F.lit(0))).alias(
            "n_bpe_tokens"
        ),
    )


def _count_token(tok: str) -> Column:
    return F.size(F.filter(tokens_col(), lambda t: t == F.lit(tok)))


def quality_scores(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_stop, n_punct, score) — length/stopword/punct
    heuristic quality score in [0,1], rounded 4dp."""
    n_tokens = F.size(tokens_col())
    n_stop = sum((_count_token(s) for s in STOPWORDS), F.lit(0))
    n_punct = F.length("text") - F.length(F.replace(F.col("text"), F.lit("."), F.lit("")))
    score = F.round(
        F.least(F.lit(1.0), n_tokens / F.lit(50.0))
        * (F.lit(0.5) + F.lit(0.5) * n_stop / F.greatest(n_tokens, F.lit(1))),
        4,
    )
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_stop.alias("n_stop"),
        n_punct.alias("n_punct"),
        score.alias("score"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """(doc_id, pred_lang) — marker-token language heuristic; ties broken
    by language code ascending (deterministic)."""
    scored = docs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(lang).alias("lang"), _count_token(tok).alias("hits"))
                    for lang, tok in sorted(LANG_MARKERS.items())
                ]
            )
        ).alias("s"),
    ).select("doc_id", "s.lang", "s.hits")
    w = Window.partitionBy("doc_id").orderBy(F.col("hits").desc(), F.col("lang").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("lang").alias("pred_lang"))
    )


def fingerprints(docs: DataFrame, shingle: int = 5) -> DataFrame:
    """(doc_id, fingerprint) — winnowing-style document fingerprint: the
    minimum md5 over all ``shingle``-token windows (md5 of the whole text
    for docs shorter than one window). Rolling-hash analog with a portable
    hash so the oracle can replay it."""
    toks = tokens_col()
    n = F.size(toks)
    windows = F.transform(
        F.sequence(F.lit(1), F.greatest(n - shingle + 1, F.lit(1))),
        lambda i: F.md5(
            F.array_join(F.slice(toks, i, shingle), " ").cast("binary")
        ),
    )
    fp = F.when(n < shingle, F.md5(F.col("text").cast("binary"))).otherwise(
        F.array_min(windows)
    )
    return docs.select("doc_id", fp.alias("fingerprint"))


def vocabulary(docs: DataFrame, k: int = 1000) -> DataFrame:
    """(token, n_occurrences, n_docs, rank) — the corpus's top-``k`` tokens
    by total occurrence count: the vocabulary-building pass of a training
    pipeline (and the input a BPE trainer would start from).

    Total order (count desc, token asc) makes the top-k deterministic and
    oracle-replayable. 100-TB shape: one explode + one map-side-combined
    groupBy keyed by token, then a two-phase partial top-k (the
    similarity._partial_topk pattern): phase 1 keeps k per input partition
    — many small parallel sorts — so the global rank only ever sees
    ≤ k·n_partitions survivors, never the full distinct-token table (web
    noise makes that table corpus-scale, not vocab-scale)."""
    counts = (
        docs.select(F.explode(tokens_col()).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
        )
    )
    per_doc = (
        docs.select("doc_id", F.explode(F.array_distinct(tokens_col())).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    part = Window.partitionBy("_pid").orderBy(
        F.col("n_occurrences").desc(), F.col("token").asc()
    )
    survivors = (
        counts.withColumn("_pid", F.spark_partition_id())
        .withColumn("prn", F.row_number().over(part))
        .filter(F.col("prn") <= k)
        .drop("_pid", "prn")
    )
    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("token").asc())
    return (
        survivors.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .join(per_doc, "token")
        .select("token", "n_occurrences", "n_docs", "rank")
    )


def tfidf_topk_terms(docs: DataFrame, k: int = 5) -> DataFrame:
    """(doc_id, token, tf, df, tfidf, rnk) — each document's top-``k``
    characteristic terms by smoothed TF-IDF (the sklearn convention:
    idf = ln((N+1)/(df+1)) + 1, never negative, never divides by zero).
    The keyword-extraction / doc-signature pass of a search or curation
    pipeline (Salton & Buckley, IP&M 24(5), 1988).

    Ranking uses the 6dp-ROUNDED tfidf with token tie-break — raw float
    order is not engine-portable (the crawl-frontier lesson; ln again).

    100-TB shape: one explode → map-side-combined groupBy (doc_id, token)
    for tf; df reuses THAT frame (its rows are already distinct doc-token
    pairs — no second tokenize pass); N folds in as a broadcast 1-row
    aggregate; the per-doc window sort is bounded by each doc's distinct
    vocabulary, never the corpus."""
    tf = (
        docs.select("doc_id", F.explode(tokens_col()).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("_n"))
    scored = (
        tf.join(df_, "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            F.round(
                F.col("tf")
                * (
                    F.log((F.col("_n") + 1) / (F.col("df") + 1))
                    + F.lit(1.0)
                ),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("token").asc()
    )
    return scored.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= k
    )


def host_distribution(docs: DataFrame, host_col: str = "source") -> DataFrame:
    """One row (n_hosts, n_docs, entropy, hhi, top1_share) — concentration
    diagnostics of the corpus's host/domain mix, the balance check a
    data-curation pipeline runs before training (domain over-concentration
    is a known failure mode; Gopher §A.2 and The Pile both report the
    mix): Shannon entropy −Σ p·ln p, the Herfindahl–Hirschman index Σ p²,
    and the largest single host's share. All from ONE host groupBy and one
    re-aggregate — no global sort anywhere (a Gini would need one; HHI
    and entropy are the sort-free concentration measures, which is why
    they're the 100-TB choice). 6dp-rounded. NULL hosts count as a
    stratum of their own via coalesce('')."""
    counts = docs.groupBy(
        F.coalesce(F.col(host_col), F.lit("")).alias("_h")
    ).agg(F.count(F.lit(1)).alias("_c"))
    tot = counts.agg(F.sum("_c").alias("_n"))
    p = F.col("_c") / F.col("_n")
    return (
        counts.crossJoin(F.broadcast(tot))
        .agg(
            F.count(F.lit(1)).alias("n_hosts"),
            F.first("_n").alias("n_docs"),
            F.round(-F.sum(p * F.log(p)), 6).alias("entropy"),
            F.round(F.sum(p * p), 6).alias("hhi"),
            F.round(F.max(p), 6).alias("top1_share"),
        )
    )


def exact_quantiles(
    df: DataFrame,
    col: str = "n_chars",
    pcts: tuple[int, ...] = (25, 50, 75, 90, 99),
) -> DataFrame:
    """(pct, value) — EXACT percentiles of an integer column, rank-based
    (percentile_disc semantics: the value at rank ceil(p·n)). The
    doc-length profile every curation pipeline reports before choosing
    min/max-length filters (Gopher §A.1.1 thresholds are length
    percentiles).

    Scale shape: approxQuantile is driver-side and approximate; this is
    the exact alternative that still scales — ONE groupBy collapses the
    rows to a VALUE HISTOGRAM (cardinality = distinct lengths, orders of
    magnitude below row count), and the cumulative window runs over that
    histogram, not the rows. The single-partition window is bounded by
    value cardinality, not data size — the standard exact-quantile trade;
    for truly unbounded-cardinality columns, bucket first.
    """
    spark = df.sparkSession
    counts = df.groupBy(F.col(col).alias("v")).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = counts.select("v", F.sum("cnt").over(w).alias("cum"))
    tot = df.agg(F.count(F.lit(1)).alias("n"))
    ps = spark.createDataFrame([(int(p),) for p in pcts], "pct int")
    return (
        cum.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(ps))
        .filter(F.col("cum") >= F.ceil(F.col("pct") / F.lit(100.0) * F.col("n")))
        .groupBy("pct")
        .agg(F.min("v").alias("value"))
    )


def source_mix_weights(docs: DataFrame, alpha: float = 0.7) -> DataFrame:
    """(source, n_docs, n_tokens, weight) — temperature-scaled multinomial
    sampling weights over corpus sources: w_s ∝ (tokens_s)^alpha, the
    GPT-3/PaLM data-mix rule (alpha < 1 up-weights small high-quality
    sources; alpha = 1 is proportional mixing). One groupBy + one 1-row
    broadcast normalizer — no sort, no collect. Token counts follow
    token_counts' split-on-space rule so the oracle replays them; NULL
    sources form their own stratum, NULL texts count 0 tokens."""
    agg = docs.groupBy(
        F.coalesce(F.col("source"), F.lit("")).alias("source")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.when(F.col("text").isNull(), F.lit(0)).otherwise(
                F.size(tokens_col())
            )
        ).alias("n_tokens"),
    )
    tot = agg.agg(F.sum(F.pow("n_tokens", F.lit(alpha))).alias("z"))
    return agg.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(F.pow("n_tokens", F.lit(alpha)) / F.col("z"), 6).alias("weight"),
    )


def heaps_law(docs: DataFrame, prefix_partitions: int = 8) -> DataFrame:
    """One-row Heaps'-law fit V(N) ≈ K·N^β of vocabulary growth over the
    corpus read in doc_id order: per doc, cumulative token count N and
    cumulative distinct-type count V (a type is "new" at the minimum
    doc_id containing it), then the least-squares fit of ln V on ln N.

    Returns (n_points, total_tokens, vocab_size, beta, k_coef) — β ≈ 0.4-0.6
    for natural text; β near 1 flags machine/noise corpora (vocabulary
    growing linearly = unbounded junk tokens), so this is a corpus-level
    quality diagnostic for training data.

    Scale shape: the cumulative sums are a distributed two-phase prefix
    sum — repartitionByRange(doc_id) so ranges are contiguous, an
    in-partition running sum (window partitioned BY the range id, never a
    global single-partition window), plus broadcast exclusive partition
    offsets — the textbook scan pattern, so the per-doc curve never
    funnels through one task. The fit itself is one scalar aggregate.
    """
    base = docs.filter(F.col("text").isNotNull())
    toks = base.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.filter(tokens_col(), lambda t: t != F.lit("")))
        ).alias("token"),
    )
    first_seen = (
        toks.groupBy("token")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("new_types"))
    )
    ntok = base.select(
        "doc_id",
        F.size(F.filter(tokens_col(), lambda t: t != F.lit(""))).alias("n_tok"),
    )
    per = (
        ntok.join(first_seen, "doc_id", "left")
        .fillna(0, subset=["new_types"])
        .repartitionByRange(prefix_partitions, "doc_id")
        .withColumn("pid", F.spark_partition_id())
        # referenced twice below (running sums + partition totals): cut
        # so the explode/groupBy pipeline runs once
        .localCheckpoint(eager=True)
    )
    w_in = Window.partitionBy("pid").orderBy("doc_id")
    per = per.select(
        "doc_id",
        "pid",
        "n_tok",
        "new_types",
        F.sum("n_tok").over(w_in).alias("ct_in"),
        F.sum("new_types").over(w_in).alias("cv_in"),
    )
    # exclusive prefix over the (tiny) per-partition totals
    w_off = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        per.groupBy("pid")
        .agg(F.sum("n_tok").alias("pt"), F.sum("new_types").alias("pv"))
        .select(
            "pid",
            F.coalesce(F.sum("pt").over(w_off), F.lit(0)).alias("off_t"),
            F.coalesce(F.sum("pv").over(w_off), F.lit(0)).alias("off_v"),
        )
    )
    pts = (
        per.join(F.broadcast(offsets), "pid")
        .select(
            (F.col("ct_in") + F.col("off_t")).alias("n_cum"),
            (F.col("cv_in") + F.col("off_v")).alias("v_cum"),
        )
        .filter((F.col("n_cum") > 0) & (F.col("v_cum") > 0))
        .select(
            F.log("n_cum").alias("x"),
            F.log("v_cum").alias("y"),
            "n_cum",
            "v_cum",
        )
    )
    agg = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.max("n_cum").alias("total_tokens"),
        F.max("v_cum").alias("vocab_size"),
    )
    beta = (F.col("sxy") - F.col("n") * F.col("mx") * F.col("my")) / (
        F.col("sxx") - F.col("n") * F.col("mx") * F.col("mx")
    )
    return agg.select(
        F.col("n").alias("n_points"),
        "total_tokens",
        "vocab_size",
        F.round(beta, 6).alias("beta"),
        F.round(F.exp(F.col("my") - beta * F.col("mx")), 6).alias("k_coef"),
    )


def lexical_diversity(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_types, ttr, entropy) — per-document lexical
    diversity: type/token ratio and unigram Shannon entropy (nats),

        H = ln(n) − (Σ_t c_t·ln(c_t)) / n

    the standard repetition/template-page detector (low entropy at high
    token count = boilerplate; the corpus-level cousin of the Gopher
    repetition masses). NULL-text and token-free docs yield no row.

    Scale shape: one explode + ONE groupBy(doc_id, token) with map-side
    partial counts, then a per-doc aggregate — the tf frame is the same
    first stage tfidf_topk_terms builds, and everything stays in JVM
    expressions (ln is natural log in BOTH engines; DuckDB log() is
    base-10 — engine lore)."""
    toks = docs.filter(F.col("text").isNotNull()).select(
        "doc_id",
        F.explode(F.filter(tokens_col(), lambda t: t != F.lit(""))).alias(
            "token"
        ),
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("c"))
    return (
        tf.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_types"),
            F.sum(F.col("c") * F.log("c")).alias("_clc"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_types",
            (F.col("n_types") / F.col("n_tokens")).alias("ttr"),
            (F.log("n_tokens") - F.col("_clc") / F.col("n_tokens")).alias(
                "entropy"
            ),
        )
    )


def langid_confusion(docs: DataFrame) -> DataFrame:
    """(actual, pred_lang, n) — confusion matrix of the lang_id heuristic
    against the corpus's labeled ``lang`` column: the eval loop for the
    language classifier (read the off-diagonal before trusting the
    marker-token rule on a new corpus). One join + one groupBy at
    label-pair cardinality."""
    pred = lang_id(docs)
    return (
        docs.select("doc_id", F.col("lang").alias("actual"))
        .join(pred, "doc_id")
        .groupBy("actual", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def exact_quantiles_by(
    df: DataFrame,
    key_col: str,
    col: str,
    pcts: tuple[int, ...] = (25, 50, 75, 90, 99),
) -> DataFrame:
    """(key, pct, value) — the per-group form of :func:`exact_quantiles`
    (percentile_disc per key): the latency/size dashboard shape. Same
    scale argument — the cumulative window runs over each group's VALUE
    histogram (partitioned by key, so no global single-partition window
    at all here), and percentiles fall out of one rank filter."""
    spark = df.sparkSession
    counts = df.groupBy(
        F.col(key_col).alias("key"), F.col(col).alias("v")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = (
        Window.partitionBy("key")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = counts.select("key", "v", F.sum("cnt").over(w).alias("cum"))
    tot = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    ps = spark.createDataFrame([(int(p),) for p in pcts], "pct int")
    return (
        cum.join(tot, "key")
        .crossJoin(F.broadcast(ps))
        .filter(
            F.col("cum") >= F.ceil(F.col("pct") / F.lit(100.0) * F.col("n"))
        )
        .groupBy("key", "pct")
        .agg(F.min("v").alias("value"))
    )


def readability(docs: DataFrame) -> DataFrame:
    """(doc_id, n_words, n_sentences, n_syllables, flesch) — Flesch
    Reading Ease (Flesch 1948): 206.835 − 1.015·(words/sentences) −
    84.6·(syllables/words), with the standard cheap syllable heuristic
    (per-word count of [aeiouy]+ vowel groups, min 1) and sentences as
    [.!?]+ runs (min 1, so punctuation-free corpora still score).

    Scale shape: map-only — one split + one transform/aggregate HOF chain
    per row, all JVM expressions, no explode/shuffle (the per-word fold
    happens inside the array, not as rows).  NULL-text docs yield no row;
    the HOF expression is instantiated exactly ONCE in the projection
    (COVERAGE.md superstep-chaining lore: duplicated HOF lambdas corrupt).
    """
    toks = F.filter(tokens_col(), lambda t: t != F.lit(""))
    base = docs.filter(F.col("text").isNotNull()).select(
        "doc_id", toks.alias("toks"), "text"
    )
    counted = base.select(
        "doc_id",
        F.size("toks").alias("n_words"),
        F.greatest(
            F.lit(1),
            F.size(F.regexp_extract_all(F.col("text"), F.lit("[.!?]+"), 0)),
        ).alias("n_sentences"),
        F.aggregate(
            F.transform(
                "toks",
                lambda w: F.greatest(
                    F.lit(1),
                    F.size(
                        F.regexp_extract_all(F.lower(w), F.lit("[aeiouy]+"), 0)
                    ),
                ),
            ),
            F.lit(0),
            lambda acc, x: acc + x,
        ).alias("n_syllables"),
    ).filter(F.col("n_words") > 0)
    return counted.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        F.round(
            F.lit(206.835)
            - F.lit(1.015)
            * (F.col("n_words").cast("double") / F.col("n_sentences"))
            - F.lit(84.6)
            * (F.col("n_syllables").cast("double") / F.col("n_words")),
            6,
        ).alias("flesch"),
    )


def keyness_by(
    docs: DataFrame, key_col: str = "lang", k: int = 10
) -> DataFrame:
    """(key, token, n, log_odds, rank) — the k most DISTINCTIVE tokens
    per corpus stratum by Haldane–Anscombe-smoothed log-odds
    ln((a+½)/(A−a+½)) − ln((b+½)/(B−b+½)), a/b = in/out-of-stratum
    counts (the "what makes this language/source different" report;
    Monroe, Colaresi & Quinn Political Analysis 2008 §3.2 with the
    uninformative prior).  Ranks on the ROUNDED log-odds with token
    tie-break.

    Shape: ONE tf groupBy(key, token) (the same first stage as tfidf),
    a corpus-total groupBy(token), two broadcast-joined 1-row/short
    total frames, then the per-key top-k window — partitioned by key,
    no global sort.  NULL keys form their own stratum; empty tokens are
    dropped."""
    toks = docs.filter(F.col("text").isNotNull()).select(
        F.coalesce(F.col(key_col), F.lit("")).alias("key"),
        F.explode(F.filter(tokens_col(), lambda t: t != F.lit(""))).alias(
            "token"
        ),
    )
    tf = toks.groupBy("key", "token").agg(F.count(F.lit(1)).alias("n"))
    ktot = tf.groupBy("key").agg(F.sum("n").alias("kt"))
    ctot = tf.groupBy("token").agg(F.sum("n").alias("ct"))
    gtot = tf.agg(F.sum("n").alias("gt"))
    j = (
        tf.join(F.broadcast(ktot), "key")
        .join(ctot, "token")
        .crossJoin(F.broadcast(gtot))
    )
    a = F.col("n") + 0.5
    na = F.col("kt") - F.col("n") + 0.5
    b = F.col("ct") - F.col("n") + 0.5
    nb = F.col("gt") - F.col("kt") - (F.col("ct") - F.col("n")) + 0.5
    scored = j.select(
        "key",
        "token",
        "n",
        F.round(F.log(a / na) - F.log(b / nb), 6).alias("log_odds"),
    )
    w = Window.partitionBy("key").orderBy(
        F.col("log_odds").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def token_freq_spectrum(docs: DataFrame) -> DataFrame:
    """(occurrences, n_types) — the frequency-of-frequencies spectrum
    (how many token TYPES occur exactly k times): the Good–Turing
    smoothing input and the standard vocabulary-burstiness diagnostic
    (n_1/N estimates the unseen-token mass).  Two chained groupBys, both
    map-side combinable; output cardinality = distinct frequencies."""
    toks = docs.filter(F.col("text").isNotNull()).select(
        F.explode(F.filter(tokens_col(), lambda t: t != F.lit(""))).alias(
            "token"
        )
    )
    tf = toks.groupBy("token").agg(F.count(F.lit(1)).alias("occurrences"))
    return tf.groupBy("occurrences").agg(F.count(F.lit(1)).alias("n_types"))
